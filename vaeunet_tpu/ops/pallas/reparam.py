"""Fused VAE reparameterization with in-kernel TPU PRNG.

z = mu + eps * exp(0.5 * logvar) * T,  eps ~ N(0,1)

The reference draws eps with cuRAND via ``torch.randn_like``
(unet_resnet.py:193, vae_utils.py:9).  Here the Gaussian noise is generated
*inside* the kernel from the TPU's hardware PRNG (`pltpu.prng_random_bits`)
via Box-Muller, fusing sampling + scale + shift into one VMEM-resident pass:
no HBM round trip for eps, no separate RNG kernel launch.

Numerical notes:
- bits -> uniform in (0,1]: (bits >> 8) * 2^-24 + 2^-25 (24-bit mantissa
  path, never 0, so log() is safe);
- Box-Muller: z = sqrt(-2 ln u1) * cos(2 pi u2);
- distribution-level parity only: RNG streams cannot match torch
  (SURVEY.md section 7, hard parts).

Interpret mode makes the kernel testable on the CPU backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _box_muller(shape):
    """Standard-normal draws from the in-kernel hardware PRNG (seeded by the
    caller via ``pltpu.prng_seed``)."""
    # two independent uniform draws; bitcast to uint32 — the raw bits are
    # int32, and an arithmetic >> of negative values would yield negative
    # "uniforms" (log() -> NaN)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical >> 8 clears the top bits, so the int32 view is non-negative
    # (Mosaic has no uint32->float cast)
    i1 = pltpu.bitcast(b1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(b2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
    u2 = i2.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


def _normal_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    out_ref[:] = _box_muller(out_ref.shape)


@functools.partial(jax.jit, static_argnums=(0, 2))
def normal_pallas(shape, seed, interpret: bool = False) -> jnp.ndarray:
    """Standard-normal [rows, cols] fp32 from the in-kernel TPU PRNG.

    The noise-only split of the fused kernel below: its sole input is the
    int32 seed, so AD treats the call as a constant and the surrounding
    ``z = mu + eps * exp(0.5 * logvar) * T`` arithmetic stays ordinary
    (differentiable, XLA-fused) — this is the form the production training
    step uses (reference counterpart ``torch.randn_like``,
    unet_resnet.py:193).  Shapes are padded up to the fp32 (8, 128) VMEM
    tile and sliced back, so tiny latents ([B, 32]) are legal.
    """
    rows, cols = shape
    pr = -(-rows // 8) * 8
    pc = -(-cols // 128) * 128
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out = pl.pallas_call(
        _normal_kernel,
        out_shape=jax.ShapeDtypeStruct((pr, pc), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed_arr)
    return out[:rows, :cols]


def _reparam_kernel(seed_ref, mu_ref, logvar_ref, temp_ref, z_ref):
    pltpu.prng_seed(seed_ref[0])
    eps = _box_muller(mu_ref.shape)
    std = jnp.exp(0.5 * logvar_ref[:]) * temp_ref[0]
    z_ref[:] = mu_ref[:] + eps * std


@functools.partial(jax.jit, static_argnums=(3,))
def reparameterize_pallas(mu: jnp.ndarray, logvar: jnp.ndarray, seed,
                          interpret: bool = False,
                          temperature: float = 1.0) -> jnp.ndarray:
    """mu, logvar: [B, D] fp32; seed: int32 scalar -> z [B, D]."""
    b, d = mu.shape
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    temp_arr = jnp.asarray(temperature, jnp.float32).reshape(1)
    return pl.pallas_call(
        _reparam_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seed_arr, mu.astype(jnp.float32), logvar.astype(jnp.float32), temp_arr)
