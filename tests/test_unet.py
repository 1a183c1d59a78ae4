"""Golden parity of the plain UNet against the actual reference module
(imported from the read-only snapshot — it only needs torch)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vaeunet_tpu.compat.torch_weights import convert_unet_state_dict
from vaeunet_tpu.models.unet import UNet


@pytest.mark.parametrize("bilinear", [False, True])
def test_unet_forward_parity(reference_path, bilinear):
    from unet.unet_model import UNet as RefUNet  # /root/reference/unet

    torch.manual_seed(0)
    ref = RefUNet(n_channels=3, n_classes=1, bilinear=bilinear)
    ref.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref_logits = ref(x).numpy()

    variables = convert_unet_state_dict(ref.state_dict(), bilinear=bilinear)
    variables = jax.tree.map(jnp.asarray, variables)
    model = UNet(n_channels=3, n_classes=1, bilinear=bilinear)
    ours = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                       train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, rtol=0, atol=2e-4)
    # BASELINE criterion: thresholded fp32 predict masks bit-for-bit
    assert ((1 / (1 + np.exp(-ours)) > 0.5) == (1 / (1 + np.exp(-ref_logits)) > 0.5)).all()


@pytest.mark.slow
def test_unet_odd_sizes(reference_path):
    """The pad-to-match path (unet_parts.py:85-89) on non-multiple-of-16
    inputs."""
    from unet.unet_model import UNet as RefUNet

    torch.manual_seed(1)
    ref = RefUNet(n_channels=3, n_classes=2, bilinear=False)
    ref.eval()
    x = torch.randn(1, 3, 50, 70)
    with torch.no_grad():
        ref_logits = ref(x).numpy()

    variables = jax.tree.map(
        jnp.asarray, convert_unet_state_dict(ref.state_dict(), bilinear=False))
    ours = UNet(3, 2, bilinear=False).apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_logits, rtol=0, atol=2e-4)


@pytest.mark.slow
def test_unet_init_and_grad():
    """From-scratch init produces finite logits and gradients flow."""
    model = UNet(3, 1)
    x = jnp.ones((1, 3 * 32 * 32), jnp.float32).reshape(1, 32, 32, 3)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False)
        return jnp.mean(jnp.square(logits))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaf_norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in leaf_norms)
    assert max(leaf_norms) > 0
