"""Parity of layer primitives (conv, conv-transpose, batchnorm, pools)
against their PyTorch counterparts."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vaeunet_tpu.ops.layers import BatchNorm, Conv, ConvTranspose2x
from vaeunet_tpu.ops.pool import avg_pool_global, max_pool


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_conv3x3_matches_torch():
    torch.manual_seed(0)
    tc = nn.Conv2d(5, 8, 3, padding=1)
    x = torch.randn(2, 5, 12, 12)
    with torch.no_grad():
        ref = _nhwc(tc(x))
    m = Conv(8, kernel_size=3, padding=1)
    params = {"params": {
        "kernel": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    ours = np.asarray(m.apply(params, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_conv7x7_stride2_matches_torch():
    torch.manual_seed(1)
    tc = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = _nhwc(tc(x))
    m = Conv(64, kernel_size=7, stride=2, padding=3, use_bias=False)
    params = {"params": {
        "kernel": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0))}}
    ours = np.asarray(m.apply(params, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_transpose_2x_bitexact():
    torch.manual_seed(2)
    tc = nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = torch.randn(2, 6, 9, 9)
    with torch.no_grad():
        ref = _nhwc(tc(x))
    m = ConvTranspose2x(4)
    params = {"params": {
        "kernel": jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}
    ours = np.asarray(m.apply(params, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_batchnorm_eval_matches_torch():
    torch.manual_seed(3)
    tb = nn.BatchNorm2d(7)
    tb.weight.data.normal_()
    tb.bias.data.normal_()
    tb.running_mean.normal_()
    tb.running_var.uniform_(0.5, 2.0)
    tb.eval()
    x = torch.randn(2, 7, 6, 6)
    with torch.no_grad():
        ref = _nhwc(tb(x))
    m = BatchNorm(7)
    variables = {
        "params": {"scale": jnp.asarray(tb.weight.detach().numpy()),
                   "bias": jnp.asarray(tb.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(tb.running_mean.numpy()),
                        "var": jnp.asarray(tb.running_var.numpy())},
    }
    ours = np.asarray(m.apply(variables, jnp.asarray(_nhwc(x)),
                              use_running_average=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_batchnorm_train_stats_match_torch():
    """Training mode: normalized output AND updated running stats must match
    PyTorch's biased-normalize / unbiased-running convention."""
    torch.manual_seed(4)
    tb = nn.BatchNorm2d(5)
    tb.train()
    x = torch.randn(4, 5, 8, 8)
    ref = _nhwc(tb(x))

    m = BatchNorm(5)
    variables = {
        "params": {"scale": jnp.ones((5,)), "bias": jnp.zeros((5,))},
        "batch_stats": {"mean": jnp.zeros((5,)), "var": jnp.ones((5,))},
    }
    ours, mutated = m.apply(variables, jnp.asarray(_nhwc(x)),
                            use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tb.running_mean.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tb.running_var.detach().numpy(), atol=1e-5)


def test_maxpool_matches_torch():
    torch.manual_seed(5)
    x = torch.randn(2, 3, 10, 10)
    ref = _nhwc(nn.MaxPool2d(2)(x))
    ours = np.asarray(max_pool(jnp.asarray(_nhwc(x)), window=2))
    assert (ours == ref).all()

    ref2 = _nhwc(nn.MaxPool2d(3, stride=2, padding=1)(x))
    ours2 = np.asarray(max_pool(jnp.asarray(_nhwc(x)), window=3, stride=2, padding=1))
    assert (ours2 == ref2).all()


def test_global_avgpool_matches_torch():
    torch.manual_seed(6)
    x = torch.randn(2, 9, 5, 7)
    ref = nn.AdaptiveAvgPool2d(1)(x).squeeze(-1).squeeze(-1).numpy()
    ours = np.asarray(avg_pool_global(jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
