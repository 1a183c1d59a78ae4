"""On-device augmentation: the MXU (matmul/separable) implementations must
match naive gather-based reference implementations of the same math.

The gather forms are what the round-1 code shipped; they were measured
~30-45x slower on the TPU (per-pixel gathers), so the production code uses
one-hot matmuls and separable takes — these tests pin the semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaeunet_tpu.data import augment as A


@pytest.fixture()
def img():
    return jax.random.uniform(jax.random.PRNGKey(0), (96, 80, 3))


@pytest.fixture()
def mask():
    return (jax.random.uniform(jax.random.PRNGKey(1), (96, 80, 1)) > 0.7
            ).astype(jnp.float32)


def test_grid_distortion_separable_matches_gather(img, mask):
    """The separable row/col lerp factorization is exact: compare against
    the full 2D bilinear gather on the same (broadcast) coordinate maps."""
    h, w = img.shape[:2]
    key = jax.random.PRNGKey(2)
    # force apply=True by sampling until the bernoulli(0.2) fires
    for i in range(100):
        k = jax.random.fold_in(key, i)
        k0, _, _ = jax.random.split(k, 3)
        if bool(jax.random.bernoulli(k0, 0.2)):
            break
    out_img, out_mask = A._grid_distortion(k, img, mask)

    # reconstruct the same maps and warp via the naive 2D gather
    _, kx, ky = jax.random.split(k, 3)
    sx = 1 + jax.random.uniform(kx, (6,), minval=-0.1, maxval=0.1)
    sy = 1 + jax.random.uniform(ky, (6,), minval=-0.1, maxval=0.1)

    def axis_map(size, steps, num_steps=5):
        step = size // num_steps
        widths = jnp.full((num_steps,), step, jnp.float32) * steps[:num_steps]
        bounds = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(widths)])
        bounds = bounds * ((size - 1) / jnp.maximum(bounds[-1], 1e-6))
        src_cell = jnp.linspace(0, size - 1, num_steps + 1)
        out_pix = jnp.arange(size, dtype=jnp.float32)
        idx = jnp.clip(jnp.searchsorted(bounds, out_pix, side="right") - 1,
                       0, num_steps - 1)
        b0, b1 = bounds[idx], bounds[idx + 1]
        frac = (out_pix - b0) / jnp.maximum(b1 - b0, 1e-6)
        return src_cell[idx] + frac * (src_cell[idx + 1] - src_cell[idx])

    ys = jnp.broadcast_to(axis_map(h, sy)[:, None], (h, w))
    xs = jnp.broadcast_to(axis_map(w, sx)[None, :], (h, w))
    ref_img = A._grid_sample_bilinear(img, ys, xs, reflect=True)
    ref_mask = A._grid_sample_nearest(mask, ys, xs, reflect=True)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(ref_img),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))


def test_clahe_matmul_matches_gather(img):
    """Blockwise one-hot-matmul CLAHE == the direct LUT-gather formulation
    (bf16 LUT values -> small tolerance)."""
    out = A._clahe(img, clip_limit=2.5)

    # naive reference: same histogram/clip/cdf, LUT applied by gather
    tiles, bins = 8, 256
    h, w = img.shape[:2]
    th, tw = -(-h // tiles), -(-w // tiles)
    ph, pw = th * tiles - h, tw * tiles - w
    lum = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    lum_p = jnp.pad(lum, ((0, ph), (0, pw)), mode="edge")
    q = jnp.clip((lum_p * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    tq = q.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    tq = tq.reshape(tiles * tiles, th * tw)
    hist = jnp.sum(jax.nn.one_hot(tq, bins, dtype=jnp.float32), axis=1)
    clip = 2.5 * (th * tw) / bins
    excess = jnp.sum(jnp.maximum(hist - clip, 0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / bins
    cdf = jnp.cumsum(hist, axis=1)
    cdf = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1e-6)
    lut = cdf.reshape(tiles, tiles, bins)
    yy = (jnp.arange(h) + 0.5) / th - 0.5
    xx = (jnp.arange(w) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.minimum(y0 + 1, tiles - 1)
    x1 = jnp.minimum(x0 + 1, tiles - 1)
    fy = jnp.clip(yy - y0, 0, 1)[:, None]
    fx = jnp.clip(xx - x0, 0, 1)[None, :]
    qhw = jnp.clip((lum * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    v00 = lut[y0[:, None], x0[None, :], qhw]
    v01 = lut[y0[:, None], x1[None, :], qhw]
    v10 = lut[y1[:, None], x0[None, :], qhw]
    v11 = lut[y1[:, None], x1[None, :], qhw]
    new_lum = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
               + fy * ((1 - fx) * v10 + fx * v11))
    ratio = new_lum / jnp.maximum(lum, 1e-6)
    ref = jnp.clip(img * ratio[..., None], 0.0, 1.0)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
    assert float(jnp.mean(jnp.abs(out - ref))) < 3e-3


def test_affine_two_pass_matches_direct_warp(img, mask):
    """Catmull-Smith two-pass == direct 2D bilinear warp of the same affine
    map, up to the interpolation-order difference (small for +-15 deg)."""
    key = jax.random.PRNGKey(3)
    for i in range(100):
        k = jax.random.fold_in(key, i)
        ks = jax.random.split(k, 5)
        if bool(jax.random.bernoulli(ks[0], 0.3)):
            break
    out_img, out_mask = A._affine(k, img, mask)

    h, w = img.shape[:2]
    scale = jax.random.uniform(ks[1], (), minval=0.9, maxval=1.1)
    tx = jax.random.uniform(ks[2], (), minval=-0.0625, maxval=0.0625) * w
    ty = jax.random.uniform(ks[3], (), minval=-0.0625, maxval=0.0625) * h
    theta = jnp.deg2rad(jax.random.uniform(ks[4], (), minval=-15.0,
                                           maxval=15.0))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    inv = 1.0 / scale
    yy, xx = jnp.mgrid[0:h, 0:w]
    dy = yy - cy - ty
    dx = xx - cx - tx
    src_y = (cos * dy + sin * dx) * inv + cy
    src_x = (-sin * dy + cos * dx) * inv + cx
    ref_img = A._grid_sample_bilinear(img, src_y, src_x, fill=0.0)
    ref_mask = A._grid_sample_nearest(mask, src_y, src_x, fill=0.0)

    assert float(jnp.mean(jnp.abs(out_img - ref_img))) < 0.02
    # mask: binary, nearest; two-pass rounding may differ near tap midpoints
    assert float(jnp.mean(jnp.abs(out_mask - ref_mask))) < 0.03


def test_affine_identity_when_not_applied(img, mask):
    """p=0 -> identity transform must round-trip exactly (the interpolation
    matrices degenerate to exact one-hots)."""
    out_img, out_mask = A._affine(jax.random.PRNGKey(4), img, mask, p=0.0)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img),
                               atol=1e-2)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(mask))


def test_full_policy_shapes_and_mask_binary(img, mask):
    out_img, out_mask = A.augment_sample(jax.random.PRNGKey(5), img, mask)
    assert out_img.shape == img.shape and out_mask.shape == mask.shape
    vals = np.unique(np.asarray(out_mask))
    assert set(vals.tolist()) <= {0.0, 1.0}
    assert float(out_img.min()) >= -1e-3 and float(out_img.max()) <= 1 + 1e-3
    # deterministic under the same key
    out2, _ = A.augment_sample(jax.random.PRNGKey(5), img, mask)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(out2))
