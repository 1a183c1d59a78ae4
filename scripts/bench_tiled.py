#!/usr/bin/env python
"""Full-resolution tiled-inference latency benchmark (BASELINE config 4):
1918x1280 Carvana-sized input, sliding-window VAE-UNet with feathered
blending, p50 single-image latency.  Host-fetch synced (the tunneled
backend's block_until_ready returns early)."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

H, W, PATCH = 1280, 1918, 512


def main():
    from vaeunet_tpu.inference.tiled import compute_tile_grid, predict_with_patches
    from vaeunet_tpu.models.vae_unet import UNetResNet

    model = UNetResNet(3, 1, latent_dim=32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), train=False)
    image = jax.random.uniform(jax.random.PRNGKey(2), (H, W, 3), jnp.float32)
    z = jnp.zeros((1, 32))
    grid = compute_tile_grid(H, W, PATCH)
    print(f"{H}x{W} -> {len(grid)} tiles of {PATCH}^2", file=sys.stderr)

    probs = predict_with_patches(model, variables, image, z, PATCH,
                                 batch_size=8)
    float(probs[0, 0, 0])  # compile + sync
    lat = []
    for _ in range(7):
        t0 = time.perf_counter()
        probs = predict_with_patches(model, variables, image, z, PATCH,
                                     batch_size=8)
        float(probs[0, 0, 0])
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    print(json.dumps({
        "metric": "tiled_inference_p50_latency_1918x1280",
        "value": round(p50 * 1e3, 1),
        "unit": "ms",
        "tiles": len(grid),
    }))


if __name__ == "__main__":
    main()
