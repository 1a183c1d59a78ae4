"""Fused conv3x3+BN-stats kernel vs the lax reference (interpret mode on
the CPU backend; the TPU lowering is benchmarked by
scripts/bench_kernels.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from vaeunet_tpu.ops.pallas.conv_bn_stats import conv3x3_bn_stats


def _ref(x, k):
    y = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y32 = y.astype(jnp.float32)
    co = y.shape[-1]
    return y, jnp.sum(y32.reshape(-1, co), 0), \
        jnp.sum(jnp.square(y32).reshape(-1, co), 0)


@pytest.mark.parametrize("shape,co", [((2, 16, 16, 8), 16),
                                      ((1, 12, 16, 4), 8)])
def test_forward_matches_lax(shape, co):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, shape[-1], co)) * 0.1
    y, s, q = conv3x3_bn_stats(x, k, jnp.float32, 8, True)
    ry, rs, rq = _ref(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ry), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(q), np.asarray(rq), rtol=1e-4,
                               atol=1e-3)


def test_grad_matches_lax():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8, 16)) * 0.1

    def loss_fused(x, k):
        y, s, q = conv3x3_bn_stats(x, k, jnp.float32, 8, True)
        # exercise all three outputs, including the moment gradients
        return jnp.sum(jnp.tanh(y)) + jnp.sum(s * 0.3) + jnp.sum(q * 0.1)

    def loss_ref(x, k):
        y, s, q = _ref(x, k)
        return jnp.sum(jnp.tanh(y)) + jnp.sum(s * 0.3) + jnp.sum(q * 0.1)

    gx1, gk1 = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-3,
                               atol=1e-3)


def test_bf16_activation_path():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 8),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 8, 16),
                          jnp.bfloat16) * 0.1
    y, s, q = conv3x3_bn_stats(x, k, jnp.bfloat16, 8, True)
    assert y.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32 and q.dtype == jnp.float32
    ry, rs, rq = _ref(x, k)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ry, np.float32), atol=0.05)
