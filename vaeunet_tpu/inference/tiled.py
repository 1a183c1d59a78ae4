"""Tiled sliding-window inference with feathered blending.

Rebuild of reference ``visualize_vae.py:243-476`` (predict_with_patches /
predict_single_patch), redesigned for XLA:

- the tile grid is computed at trace time (adaptive overlap
  ``clamp(0.2*P, 32, 128)``, edge-clamped last row/col — :250-251, :270-288),
  so every tile has the same static [P, P] shape;
- all tiles are gathered into one [T, P, P, C] tensor and run through the
  network in fixed-size batches via ``lax.map`` (no Python-loop dispatch,
  no OOM-retry fallback — memory is static);
- the linear-ramp feather weights (:361-378) depend only on grid position,
  so they are baked as constants; accumulation is an on-device scatter-add
  (the reference round-trips every tile through the CPU, :380-384);
- for N-sample latent ensembles the per-tile encoder features are computed
  ONCE and the decoder is vmapped over samples — the reference re-encodes
  every tile for every sample (:617-647), an N-fold waste.

This spatial tiling is the framework's long-context analogue: the image
plane is the sequence, tiles are chunks, and the feathered overlap is the
halo (SURVEY.md section 5, long-context row).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaeunet_tpu.models.vae_unet import UNetResNet


def adaptive_overlap(patch_size: int) -> int:
    """clamp(0.2 * patch, 32, 128)  (visualize_vae.py:250-251)."""
    return max(min(int(patch_size * 0.2), 128), 32)


def compute_tile_grid(h: int, w: int, patch_size: int,
                      overlap: Optional[int] = None) -> List[Tuple[int, int]]:
    """Static (y, x) tile origins; last row/col clamped to the image edge
    (visualize_vae.py:253-288).  Requires h, w >= patch_size."""
    if overlap is None:
        overlap = adaptive_overlap(patch_size)
    assert h >= patch_size and w >= patch_size, (
        f"image {h}x{w} smaller than patch {patch_size}")
    stride = patch_size - overlap
    n_h = math.ceil((h - overlap) / stride)
    n_w = math.ceil((w - overlap) / stride)
    grid = []
    for i in range(n_h):
        for j in range(n_w):
            y = (h - patch_size) if i == n_h - 1 else i * stride
            x = (w - patch_size) if j == n_w - 1 else j * stride
            grid.append((y, x))
    return grid


def tile_weight_masks(h: int, w: int, patch_size: int,
                      overlap: Optional[int] = None) -> np.ndarray:
    """[T, P, P, 1] feather weights: linspace(0,1,overlap) ramps on interior
    edges, exactly the reference's blending (visualize_vae.py:361-378)."""
    if overlap is None:
        overlap = adaptive_overlap(patch_size)
    stride = patch_size - overlap
    n_h = math.ceil((h - overlap) / stride)
    n_w = math.ceil((w - overlap) / stride)
    ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
    masks = []
    for i in range(n_h):
        for j in range(n_w):
            wgt = np.ones((patch_size, patch_size), np.float32)
            if patch_size > 2 * overlap:
                if i > 0:
                    wgt[:overlap, :] *= ramp[:, None]
                if i < n_h - 1:
                    wgt[-overlap:, :] *= (1.0 - ramp)[:, None]
                if j > 0:
                    wgt[:, :overlap] *= ramp[None, :]
                if j < n_w - 1:
                    wgt[:, -overlap:] *= (1.0 - ramp)[None, :]
            masks.append(wgt)
    return np.stack(masks)[..., None]


def _gather_tiles(image: jnp.ndarray, grid, patch_size: int) -> jnp.ndarray:
    """image [H,W,C] -> [T,P,P,C] (static slices, fused by XLA)."""
    return jnp.stack([
        jax.lax.dynamic_slice(image, (y, x, 0),
                              (patch_size, patch_size, image.shape[-1]))
        for (y, x) in grid
    ])


def _scatter_blend(preds: jnp.ndarray, weights: jnp.ndarray, grid,
                   out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Weighted scatter-add of [T,P,P,C] tiles into [H,W,C], normalized.
    (visualize_vae.py:383-384,409)"""
    h, w = out_hw
    c = preds.shape[-1]
    out = jnp.zeros((h, w, c), jnp.float32)
    wsum = jnp.zeros((h, w, c), jnp.float32)
    ys = jnp.asarray([g[0] for g in grid], jnp.int32)
    xs = jnp.asarray([g[1] for g in grid], jnp.int32)

    def body(carry, t):
        out, wsum = carry
        pred, wgt, y, x = t
        patch = jax.lax.dynamic_slice(out, (y, x, 0), pred.shape)
        out = jax.lax.dynamic_update_slice(out, patch + pred * wgt, (y, x, 0))
        wpatch = jax.lax.dynamic_slice(wsum, (y, x, 0), wgt.shape)
        wsum = jax.lax.dynamic_update_slice(wsum, wpatch + wgt, (y, x, 0))
        return (out, wsum), None

    (out, wsum), _ = jax.lax.scan(
        body, (out, wsum),
        (preds.astype(jnp.float32), jnp.broadcast_to(weights, preds.shape), ys, xs))
    return out / (wsum + 1e-8)


def _batched_map(fn, xs: jnp.ndarray, batch_size: int):
    """Apply fn over the leading axis in fixed-size chunks (pad + trim).
    fn may return any pytree of arrays with a leading batch axis."""
    t = xs.shape[0]
    n_batches = -(-t // batch_size)
    pad = n_batches * batch_size - t
    if pad:
        xs = jnp.concatenate([xs, jnp.repeat(xs[-1:], pad, axis=0)])
    xs = xs.reshape(n_batches, batch_size, *xs.shape[1:])
    out = jax.lax.map(fn, xs)
    return jax.tree.map(
        lambda o: o.reshape(n_batches * batch_size, *o.shape[2:])[:t], out)


def encode_tiles(model: UNetResNet, variables, image: jnp.ndarray,
                 patch_size: int, overlap: Optional[int] = None,
                 batch_size: int = 8):
    """Encoder features for every tile of `image` [H,W,C].
    -> (grid, list-of-feature-stacks each [T, h_i, w_i, c_i])."""
    h, w = image.shape[0], image.shape[1]
    grid = compute_tile_grid(h, w, patch_size, overlap)
    tiles = _gather_tiles(image, grid, patch_size)

    def enc(batch):
        feats = model.apply(variables, batch, False,
                            method=lambda m, x, t: m.encoder(x, train=t))
        return tuple(feats)

    feats = _batched_map(enc, tiles, batch_size)
    return grid, list(feats)


def _decode_tiles(model: UNetResNet, variables, features, z: jnp.ndarray,
                  patch_size: int, batch_size: int = 8) -> jnp.ndarray:
    """Decode every tile with the shared latent z [1,D] -> sigmoid [T,P,P,1].
    Matches the reference's per-tile decode (visualize_vae.py:322-345):
    z is broadcast to each tile's bottleneck."""
    t = features[0].shape[0]

    def dec(feat_batch):
        b = feat_batch[0].shape[0]
        zb = jnp.broadcast_to(z, (b, z.shape[-1]))
        logits = model.apply(variables, zb, list(feat_batch),
                             (patch_size, patch_size), False,
                             method=UNetResNet.decode_features)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    n_batches = -(-t // batch_size)
    pad = n_batches * batch_size - t
    feats = []
    for f in features:
        if pad:
            f = jnp.concatenate([f, jnp.repeat(f[-1:], pad, axis=0)])
        feats.append(f.reshape(n_batches, batch_size, *f.shape[1:]))
    out = jax.lax.map(dec, tuple(feats))
    out = out.reshape(n_batches * batch_size, patch_size, patch_size, -1)
    return out[:t]


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def predict_with_patches(model: UNetResNet, variables, image: jnp.ndarray,
                         z: jnp.ndarray, patch_size: int = 512,
                         overlap: Optional[int] = None,
                         batch_size: int = 8) -> jnp.ndarray:
    """Tiled sigmoid probability map [H,W,1] for one image [H,W,C] and one
    latent z [1,D].  (visualize_vae.py:243-415)"""
    if overlap is None:
        overlap = adaptive_overlap(patch_size)
    h, w = image.shape[0], image.shape[1]
    grid, features = encode_tiles(model, variables, image, patch_size,
                                  overlap, batch_size)
    preds = _decode_tiles(model, variables, features, z, patch_size, batch_size)
    weights = jnp.asarray(tile_weight_masks(h, w, patch_size, overlap))
    return _scatter_blend(preds, weights, grid, (h, w))


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def predict_tiled_ensemble(model: UNetResNet, variables, image: jnp.ndarray,
                           zs: jnp.ndarray, patch_size: int = 512,
                           overlap: Optional[int] = None,
                           batch_size: int = 8) -> jnp.ndarray:
    """[N,H,W,1] sigmoid maps for N latents zs [N,D] — tile encoder runs
    ONCE, decoder is vmapped over the sample axis."""
    if overlap is None:
        overlap = adaptive_overlap(patch_size)
    h, w = image.shape[0], image.shape[1]
    grid, features = encode_tiles(model, variables, image, patch_size,
                                  overlap, batch_size)
    weights = jnp.asarray(tile_weight_masks(h, w, patch_size, overlap))

    def one_sample(z):
        preds = _decode_tiles(model, variables, features, z[None],
                              patch_size, batch_size)
        return _scatter_blend(preds, weights, grid, (h, w))

    return jax.lax.map(one_sample, zs)
