"""Pallas kernels in interpret mode (CPU backend): correctness vs lax."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaeunet_tpu.ops.pallas.bn_relu import fused_bn_relu
from vaeunet_tpu.ops.pallas.reparam import reparameterize_pallas
from vaeunet_tpu.ops.pallas import resize_mm
from vaeunet_tpu.ops.resize import _interp_matrix, resize_bilinear


def test_fused_bn_relu_matches_lax():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 9, 16).astype(np.float32))
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    mean = jnp.asarray(rng.randn(16).astype(np.float32))
    var = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)

    ours = fused_bn_relu(x, scale, bias, mean, var, True)
    ref = jnp.maximum(
        (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias, 0.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_fused_bn_relu_nonaligned_rows():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 7, 5, 8).astype(np.float32))  # 105 rows
    ones = jnp.ones(8)
    zeros = jnp.zeros(8)
    ours = fused_bn_relu(x, ones, zeros, zeros, ones, True)
    ref = jnp.maximum(x * jax.lax.rsqrt(jnp.ones(8) + 1e-5), 0.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_resize_mm_matches_reference():
    """Blocked interp-matrix resize kernels == the model's resize_bilinear.

    The kernels are kept in-tree but unused by default: on the v5e the XLA
    einsum lowering won the end-of-round A/B at 4/5 decoder shapes
    (RESULTS.md round 2) — this test keeps them correct for future fusion
    work and for shapes where they do win (bottleneck up, 1.43x).
    """
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 24, 8).astype(np.float32))
    mh = jnp.asarray(_interp_matrix(16, 32, True))
    mw = jnp.asarray(_interp_matrix(24, 48, True))

    yw = resize_mm.resize_w(x, mw, 48, True)
    yh = resize_mm.resize_h(yw, mh, 32, True)
    ref = resize_bilinear(x, (32, 48), align_corners=True)
    np.testing.assert_allclose(np.asarray(yh), np.asarray(ref), atol=1e-5)


def test_resize_mm_vjp_is_transposed_downsample():
    """custom_vjp of the pallas resize == VJP of the dense matmul form."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 8, 8, 8).astype(np.float32))
    m = jnp.asarray(_interp_matrix(8, 16, True))
    mt = jnp.asarray(m.T).copy()

    def pallas_sum(x):
        return jnp.sum(resize_mm.resize_h_op(x, m, mt, 16) ** 2)

    def dense_sum(x):
        return jnp.sum(jnp.einsum("oh,bhwc->bowc", m, x) ** 2)

    g_pallas = jax.grad(pallas_sum)(x)
    g_dense = jax.grad(dense_sum)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense),
                               atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU interpret rule; "
                    "exercised on real TPU (see scripts/tpu_smoke.py)")
def test_reparam_pallas_statistics():
    """In-kernel PRNG reparameterization: z ~ N(mu, e^logvar * T^2) at the
    distribution level (RNG-stream parity is impossible across backends)."""
    n = 4096
    mu = jnp.broadcast_to(jnp.asarray([1.0, -2.0]), (n, 2))
    logvar = jnp.broadcast_to(jnp.asarray([0.0, np.log(4.0)]), (n, 2))
    z = reparameterize_pallas(mu, logvar, seed=7, interpret=False,
                              temperature=1.0)
    z = np.asarray(z)
    assert z.shape == (n, 2)
    np.testing.assert_allclose(z.mean(0), [1.0, -2.0], atol=0.15)
    np.testing.assert_allclose(z.std(0), [1.0, 2.0], rtol=0.1)
    # temperature scales the spread
    z2 = np.asarray(reparameterize_pallas(mu, logvar, seed=7,
                                          temperature=2.0))
    np.testing.assert_allclose(z2.std(0), [2.0, 4.0], rtol=0.1)
    # same seed -> identical draws; different seed -> different
    z3 = np.asarray(reparameterize_pallas(mu, logvar, seed=7,
                                          temperature=1.0))
    np.testing.assert_array_equal(z, z3)
    z4 = np.asarray(reparameterize_pallas(mu, logvar, seed=8,
                                          temperature=1.0))
    assert not np.array_equal(z, z4)


def test_gaussian_like_cpu_fallback_and_batch_sampler():
    """Off-TPU, gaussian_like == jax.random.normal bit-for-bit, and
    sample_latents draws all N samples from ONE noise call with the same
    logvar guard as sample_from_latent."""
    from vaeunet_tpu.ops.sampling import gaussian_like
    from vaeunet_tpu.vae_utils import sample_latents

    key = jax.random.PRNGKey(3)
    eps = gaussian_like(key, (5, 7), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(eps), np.asarray(jax.random.normal(key, (5, 7))))

    mu = jnp.asarray(np.random.RandomState(0).randn(4, 16).astype(np.float32))
    logvar = jnp.zeros((4, 16))
    zs = sample_latents(mu, logvar, key, temperature=2.0, num_samples=6)
    assert zs.shape == (6, 4, 16)
    eps6 = jax.random.normal(key, (6, 4, 16))
    np.testing.assert_allclose(np.asarray(zs),
                               np.asarray(mu[None] + 2.0 * eps6),
                               rtol=1e-6, atol=1e-6)
    # the guard bounds out-of-distribution logvar exactly like the scalar path
    z_wild = sample_latents(mu, jnp.full((4, 16), 30.0), key, num_samples=2)
    assert float(jnp.abs(z_wild - mu[None]).max()) < 10 * float(jnp.exp(1.0))


def test_gaussian_like_env_off(monkeypatch):
    """VAEUNET_PALLAS_REPARAM=0 forces the jax.random path everywhere."""
    from vaeunet_tpu.ops import sampling

    monkeypatch.setenv("VAEUNET_PALLAS_REPARAM", "0")
    assert sampling._use_pallas() is False
    monkeypatch.setenv("VAEUNET_PALLAS_REPARAM", "auto")
    assert sampling._use_pallas() is (jax.default_backend() == "tpu")


def test_seed_from_key_distinct_and_stable():
    from vaeunet_tpu.ops.sampling import _seed_from_key

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    s1 = int(_seed_from_key(k1))
    s2 = int(_seed_from_key(k2))
    assert s1 != s2
    assert int(_seed_from_key(k1)) == s1
    # typed keys fold to the same seed as their raw key_data
    tk = jax.random.wrap_key_data(jax.random.key_data(k1))
    assert int(_seed_from_key(tk)) == s1


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU interpret rule; "
                    "exercised on real TPU (see scripts/tpu_smoke.py)")
def test_normal_pallas_statistics_tpu():
    """The production noise kernel: N(0,1) moments, seed-deterministic,
    legal at the tiny latent shape (rows/cols below one VMEM tile)."""
    from vaeunet_tpu.ops.pallas.reparam import normal_pallas

    z = np.asarray(normal_pallas((4096, 64), seed=11))
    assert abs(z.mean()) < 0.05 and abs(z.std() - 1.0) < 0.05
    z_small = np.asarray(normal_pallas((3, 32), seed=11))
    assert z_small.shape == (3, 32)
    np.testing.assert_array_equal(
        np.asarray(normal_pallas((3, 32), seed=11)), z_small)
    assert not np.array_equal(
        np.asarray(normal_pallas((3, 32), seed=12)), z_small)
