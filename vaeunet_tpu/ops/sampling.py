"""Gaussian-noise dispatch: in-kernel TPU PRNG in production, jax.random off-TPU.

BASELINE.json's north star names the VAE bottleneck reparameterization as an
in-kernel-TPU-PRNG op (reference counterpart: cuRAND via ``torch.randn_like``,
/root/reference/unet/unet_resnet.py:193 and utils/vae_utils.py:9).  Every
production sampling site (the training step's reparameterize, the inference
ensemble's tempered draws) funnels through :func:`gaussian_like`, which

- on the TPU backend draws the noise with ``ops.pallas.reparam.normal_pallas``
  (hardware PRNG + Box-Muller inside one VMEM-resident kernel, seeded from the
  caller's JAX PRNG key so streams stay key-disjoint);
- elsewhere (CPU tests, the virtual-device dryrun mesh) uses
  ``jax.random.normal`` — ``pltpu.prng_seed`` has no CPU interpret rule, and
  bit-parity across backends is impossible either way (SURVEY.md §7, hard
  parts), so parity is defined at distribution level
  (tests/test_pallas.py moment checks, TPU-marked).

Env override ``VAEUNET_PALLAS_REPARAM``: ``0/off`` forces ``jax.random``
everywhere (the escape hatch); anything else (default ``auto``) uses the
Pallas kernel exactly when the default backend is TPU.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

from vaeunet_tpu.ops.pallas.reparam import normal_pallas


def _use_pallas() -> bool:
    """Evaluated at trace time (backend choice is static under jit)."""
    mode = os.environ.get("VAEUNET_PALLAS_REPARAM", "auto").lower()
    if mode in ("0", "off", "false", "no"):
        return False
    return jax.default_backend() == "tpu"


def _seed_from_key(rng) -> jnp.ndarray:
    """Fold a JAX PRNG key into one int32 seed for the hardware PRNG."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    data = rng.reshape(-1).astype(jnp.uint32)
    folded = data[0]
    for i in range(1, data.shape[0]):
        folded = folded ^ (data[i] + jnp.uint32(0x9E3779B9) + (folded << 6))
    return jax.lax.bitcast_convert_type(folded, jnp.int32)


def gaussian_like(rng, shape: Sequence[int],
                  dtype=jnp.float32) -> jnp.ndarray:
    """eps ~ N(0, 1) of `shape`, from the backend-appropriate generator."""
    shape = tuple(int(s) for s in shape)
    if not _use_pallas() or not shape:
        return jax.random.normal(rng, shape, dtype)
    rows = 1
    for s in shape[:-1]:
        rows *= s
    eps = normal_pallas((rows, shape[-1]), _seed_from_key(rng))
    return eps.reshape(shape).astype(dtype)
