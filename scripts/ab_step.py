#!/usr/bin/env python
"""A/B the headline train step (bench.py config) across lowering variants.

One process, one TPU attach (wedge discipline). Fresh train state per
variant (the step donates its input state). Variants are named on the
command line; each maps to module-level switches set before tracing.

  python scripts/ab_step.py mm band-stack band-pad
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import vaeunet_tpu.ops.resize as R

HW, BATCH, STEPS, WARMUP = 512, 16, 15, 3

VARIANTS = {
    # name: (band2x on, pad interleave, h-pass mode, gather2x axes)
    "mm": (False, False, "einsum", ""),
    "band-stack": (True, False, "einsum", ""),
    "band-pad": (True, True, "einsum", ""),
    "mm-bwoc": (False, False, "bwoc", ""),
    "g2x-h": (False, False, "einsum", "h"),
    "g2x-hw": (False, False, "einsum", "hw"),
}


def run_variant(name: str) -> float:
    from vaeunet_tpu.training.config import TrainConfig
    from vaeunet_tpu.training.state import create_train_state
    from vaeunet_tpu.training.step import make_train_step

    # "<variant>@<batch>" overrides the batch size (e.g. mm@24) to A/B
    # whether a larger per-step batch amortizes fixed overheads.
    name, _, bs = name.partition("@")
    B = int(bs) if bs else BATCH
    band, pad, hmode, g2x = VARIANTS[name]
    R._BAND2X = band
    R._BAND2X_PAD = pad
    R._HMODE = hmode
    R._GATHER2X = g2x

    config = TrainConfig(model_type="resnet", batch_size=B,
                         gradient_accumulation_steps=1, amp=True,
                         patch_size=HW, learning_rate=1e-4, seed=0)
    state = create_train_state(config, jax.random.PRNGKey(0), (HW, HW))
    step = make_train_step(config)   # jit'd, donates state
    images = jax.random.uniform(jax.random.PRNGKey(1), (B, HW, HW, 3),
                                jnp.float32)
    masks = (jax.random.uniform(jax.random.PRNGKey(2),
                                (B, HW, HW, 1)) > 0.9).astype(jnp.float32)
    beta = jnp.float32(0.001)
    for _ in range(WARMUP):
        state, aux = step(state, images, masks, beta)
    float(aux["loss"])  # host fetch = the only reliable barrier (tunnel)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, aux = step(state, images, masks, beta)
    float(aux["loss"])
    dt = time.perf_counter() - t0
    print(f"{name}: {B * STEPS / dt:.1f} img/s  ({dt / STEPS * 1e3:.1f} ms/step)",
          flush=True)
    del state
    return B * STEPS / dt


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run_variant(n)
