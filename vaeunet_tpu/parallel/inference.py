"""Multi-device inference: sample-parallel uncertainty ensembles.

The reference generates its N-sample uncertainty ensemble serially on one
GPU (visualize_vae.py:617-647).  On a TPU mesh the sample axis is
embarrassingly parallel: vmap the decode over z and shard that axis over the
'data' mesh axis — each chip decodes its share of the samples from the
replicated encoder features, and the stacked maps come back sharded.

Spatial parallelism of a single huge image (sharding H over the mesh with
halo exchange) is the other scale-out axis; the tiled path already gives an
equivalent decomposition, so tiles x samples saturate a pod slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vaeunet_tpu.models.vae_unet import UNetResNet


@functools.partial(jax.jit, static_argnums=(0,))
def _decode_samples_vmapped(model, variables, image, zs):
    """[N,D] zs -> [N,H,W,1] sigmoid maps; vmap (not lax.map) so XLA can
    partition the sample axis across devices."""
    h, w = image.shape[0], image.shape[1]
    _, _, features = model.apply(variables, image[None], False,
                                 method=UNetResNet.encode_with_features)

    def one(z):
        logits = model.apply(variables, z[None], features, (h, w), False,
                             method=UNetResNet.decode_features)
        return jax.nn.sigmoid(logits.astype(jnp.float32))[0]

    return jax.vmap(one)(zs)


def ensemble_sample_parallel(model: UNetResNet, variables, image, zs,
                             mesh: Mesh) -> jnp.ndarray:
    """Full-image N-sample ensemble with samples sharded over 'data'.
    zs: [N, D] with N divisible by the data axis size."""
    n_data = mesh.shape["data"]
    assert zs.shape[0] % n_data == 0, (
        f"samples {zs.shape[0]} not divisible by data axis {n_data}")
    zs = jax.device_put(zs, NamedSharding(mesh, P("data")))
    variables = jax.device_put(variables, NamedSharding(mesh, P()))
    image = jax.device_put(image, NamedSharding(mesh, P()))
    return _decode_samples_vmapped(model, variables, image, zs)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _tiles_forward_vmapped(model, variables, tiles, z, patch_size, overlap):
    """[T,P,P,C] tiles -> [T,P,P,1] sigmoid maps with a shared latent;
    vmap over the tile axis so XLA can partition it across devices."""

    def one(tile):
        mu, logvar, feats = model.apply(
            variables, tile[None], False,
            method=UNetResNet.encode_with_features)
        logits = model.apply(variables, z, feats, (patch_size, patch_size),
                             False, method=UNetResNet.decode_features)
        return jax.nn.sigmoid(logits.astype(jnp.float32))[0]

    return jax.vmap(one)(tiles)


def predict_tiled_sharded(model: UNetResNet, variables, image, z,
                          mesh: Mesh, patch_size: int = 512,
                          overlap=None) -> jnp.ndarray:
    """Sliding-window prediction with the TILE GRID sharded over the 'data'
    mesh axis — the spatial scale-out path for images whose tile set exceeds
    one chip's appetite (SURVEY.md section 5, long-context row).  Each chip
    encodes+decodes its share of tiles; the feathered blend runs on the
    gathered maps.  image [H,W,C], z [1,D] -> [H,W,1].
    """
    from vaeunet_tpu.inference.tiled import (_gather_tiles, _scatter_blend,
                                             adaptive_overlap,
                                             compute_tile_grid,
                                             tile_weight_masks)

    if overlap is None:
        overlap = adaptive_overlap(patch_size)
    h, w = image.shape[0], image.shape[1]
    grid = compute_tile_grid(h, w, patch_size, overlap)
    tiles = _gather_tiles(jnp.asarray(image), grid, patch_size)

    n_data = mesh.shape["data"]
    t = tiles.shape[0]
    pad = (-t) % n_data
    if pad:
        tiles = jnp.concatenate([tiles, jnp.repeat(tiles[-1:], pad, axis=0)])
    tiles = jax.device_put(tiles, NamedSharding(mesh, P("data")))
    variables_r = jax.device_put(variables, NamedSharding(mesh, P()))
    z_r = jax.device_put(z, NamedSharding(mesh, P()))
    preds = _tiles_forward_vmapped(model, variables_r, tiles, z_r,
                                   patch_size, overlap)[:t]
    weights = jnp.asarray(tile_weight_masks(h, w, patch_size, overlap))
    return _scatter_blend(preds, weights, grid, (h, w))
