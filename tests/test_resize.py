"""Parity of resize ops against torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vaeunet_tpu.ops.resize import (
    broadcast_latent_spatial,
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear_align_corners,
)


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
    kwargs = {} if align_corners is None else {"align_corners": align_corners}
    y = F.interpolate(t, size=size, mode=mode, **kwargs)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 9), (14, 18)),
    ((16, 16), (32, 32)),
    ((13, 7), (5, 11)),    # downscale
    ((8, 8), (8, 8)),      # identity
    ((1, 5), (3, 10)),     # degenerate H
])
@pytest.mark.parametrize("align", [True, False])
def test_bilinear_matches_torch(in_hw, out_hw, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    ref = _torch_resize(x, out_hw, "bilinear", align)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_bilinear_upscale_ulp_close():
    """The hot decoder path (2x align-corners upsample) must be within 2 ulp
    of torch on the CPU backend (torch's SIMD kernel FMA accounts for the
    residual); bit-parity is asserted on thresholded masks downstream."""
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 8).astype(np.float32)
    ours = np.asarray(upsample2x_bilinear_align_corners(jnp.asarray(x)))
    ref = _torch_resize(x, (32, 32), "bilinear", True)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-7)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((10, 10), (25, 25)),
    ((25, 25), (10, 10)),
    ((7, 9), (14, 18)),
])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(2)
    x = rng.randn(2, *in_hw, 1).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = _torch_resize(x, out_hw, "nearest")
    assert (ours == ref).all()


@pytest.mark.parametrize("axis_from_end,in_size,out_size", [
    (3, 16, 31),   # H axis of NHWC, upscale
    (2, 16, 31),   # W axis of NHWC, upscale
    (3, 31, 16),   # H downscale
    (2, 31, 16),   # W downscale
    (4, 6, 11),    # generic moveaxis path (extra leading dim)
])
@pytest.mark.parametrize("align", [True, False])
def test_mm_blend_value_and_grad_match_gather_path(axis_from_end, in_size,
                                                   out_size, align):
    """The TPU interp-matrix lowering (`_mm_blend`, with its custom VJP that
    expresses the cotangent as a forward-form transposed-matrix contraction)
    must match the gather/lerp parity path in both value and gradient."""
    import jax
    from vaeunet_tpu.ops import resize as R

    rng = np.random.RandomState(4)
    ndim = 5 if axis_from_end == 4 else 4
    shape = [2] * (ndim - 3) + [in_size if axis_from_end == 3 else 7,
                                in_size if axis_from_end == 2 else 7, 3]
    if axis_from_end == 4:
        shape = [2, in_size, 7, 7, 3]
    x = rng.randn(*shape).astype(np.float32)
    axis = ndim - axis_from_end

    def gather(v):
        coords = R._source_coords(in_size, out_size, align)
        i0 = np.clip(np.floor(coords).astype(np.int32), 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        lam = jnp.asarray((coords - i0).astype(np.float32))
        s = [1] * v.ndim
        s[axis] = out_size
        lam = lam.reshape(s)
        return (1.0 - lam) * jnp.take(v, i0, axis=axis) + \
            lam * jnp.take(v, i1, axis=axis)

    def mm(v):
        return R._mm_blend(v, axis, in_size, out_size, align)

    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(mm(xj)), np.asarray(gather(xj)),
                               rtol=0, atol=1e-5)

    ct = jnp.asarray(rng.randn(*mm(xj).shape).astype(np.float32))
    g_mm = jax.grad(lambda v: jnp.sum(mm(v) * ct))(xj)
    g_ga = jax.grad(lambda v: jnp.sum(gather(v) * ct))(xj)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ga),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("axis_from_end", [3, 2])
@pytest.mark.parametrize("in_size", [5, 8, 16])
@pytest.mark.parametrize("align", [True, False])
def test_band_blend_up2_matches_mm_blend(axis_from_end, in_size, align):
    """The exact-2x banded elementwise lowering (the TPU layout-copy killer)
    must match the interp-matrix contraction in value and gradient."""
    import jax
    from vaeunet_tpu.ops import resize as R

    rng = np.random.RandomState(7)
    shape = [2, in_size if axis_from_end == 3 else 7,
             in_size if axis_from_end == 2 else 7, 3]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    axis = 4 - axis_from_end

    def band(v):
        return R._band_blend_up2(v, axis, in_size, align)

    def mm(v):
        return R._mm_blend(v, axis, in_size, 2 * in_size, align)

    np.testing.assert_allclose(np.asarray(band(x)), np.asarray(mm(x)),
                               rtol=0, atol=1e-5)

    ct = jnp.asarray(rng.randn(*mm(x).shape).astype(np.float32))
    g_band = jax.grad(lambda v: jnp.sum(band(v) * ct))(x)
    g_mm = jax.grad(lambda v: jnp.sum(mm(v) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_mm),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("axis_from_end", [3, 2])
@pytest.mark.parametrize("in_size", [5, 8, 16])
@pytest.mark.parametrize("align", [True, False])
def test_gather_blend_up2_matches_mm_blend(axis_from_end, in_size, align):
    """The exact-2x gather-lerp lowering (natural-order forward, banded
    strided-slice VJP) must match the interp-matrix contraction in value
    and gradient."""
    import jax
    from vaeunet_tpu.ops import resize as R

    rng = np.random.RandomState(11)
    shape = [2, in_size if axis_from_end == 3 else 7,
             in_size if axis_from_end == 2 else 7, 3]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    axis = 4 - axis_from_end

    def ga(v):
        return R._gather_blend_up2(v, axis, in_size, align)

    def mm(v):
        return R._mm_blend(v, axis, in_size, 2 * in_size, align)

    np.testing.assert_allclose(np.asarray(ga(x)), np.asarray(mm(x)),
                               rtol=0, atol=1e-5)

    ct = jnp.asarray(rng.randn(*mm(x).shape).astype(np.float32))
    g_ga = jax.grad(lambda v: jnp.sum(ga(v) * ct))(x)
    g_mm = jax.grad(lambda v: jnp.sum(mm(v) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_ga), np.asarray(g_mm),
                               rtol=0, atol=1e-5)


def test_broadcast_latent_equals_interp_of_1x1():
    """Interpolating a 1x1 map == broadcast (the reference does the former,
    unet_resnet.py:217-221; we do the latter)."""
    rng = np.random.RandomState(3)
    z = rng.randn(4, 32).astype(np.float32)
    ours = np.asarray(broadcast_latent_spatial(jnp.asarray(z), (8, 8)))
    t = torch.from_numpy(z)[:, :, None, None]
    ref = F.interpolate(t, size=(8, 8), mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert (ours == ref).all()
