"""VAE sampling utilities (functional rebuild of reference utils/vae_utils.py).

- sample_from_latent      <- vae_utils.py:5-10
- encode_images           <- vae_utils.py:13-25
- generate_predictions    <- vae_utils.py:28-76, but vmap'd over the sample
                             axis instead of a Python loop (the single biggest
                             idiomatic win over the reference, SURVEY.md §7-9)
- calculate_latent_stats  <- vae_utils.py:79-103
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vaeunet_tpu.models.vae_unet import UNetResNet
from vaeunet_tpu.ops.sampling import gaussian_like


LOGVAR_GUARD = 2.0


def sample_from_latent(mu: jnp.ndarray, logvar: jnp.ndarray, rng,
                       temperature: float = 1.0) -> jnp.ndarray:
    """z = mu + eps * std * T  (vae_utils.py:5-10).

    Inference guard: `logvar` is clamped to +-LOGVAR_GUARD before
    exponentiation.  The encoder is trained on 512^2 patches; encoding a
    whole fundus image (the uncertainty protocol, predict.py) is out of
    that distribution and can blow the logvar head up to ~21 (posterior
    std ~4e4 vs the N(0,1) prior) — sampled latents then saturate the
    decoder to zero probability everywhere.  A posterior std e>= the
    prior's is uncertainty; 4 orders of magnitude above it is a numeric
    pathology, so the clamp bounds std to e^1 without touching training
    (the KL term uses raw logvar) or in-range members (measured encoder
    logvar on healthy members: [-0.5, 0.2])."""
    std = jnp.exp(0.5 * jnp.clip(logvar, -LOGVAR_GUARD, LOGVAR_GUARD))
    std = std * temperature
    eps = gaussian_like(rng, std.shape, std.dtype)
    return mu + eps * std


def sample_latents(mu: jnp.ndarray, logvar: jnp.ndarray, rng,
                   temperature: float = 1.0,
                   num_samples: int = 1) -> jnp.ndarray:
    """[N, B, D] tempered draws in ONE noise call (same guard as
    sample_from_latent).  One kernel launch instead of a vmap over per-sample
    keys — on TPU the noise comes from the in-kernel hardware PRNG
    (ops/sampling.py), which composes with batching by flattening rather than
    by a pallas batching rule."""
    std = jnp.exp(0.5 * jnp.clip(logvar, -LOGVAR_GUARD, LOGVAR_GUARD))
    std = std * temperature
    eps = gaussian_like(rng, (num_samples, *std.shape), std.dtype)
    return mu[None] + eps * std[None]


def encode_images(model: UNetResNet, variables, images) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-mode encoder -> (mu, logvar).  (vae_utils.py:13-25)"""
    return model.apply(variables, images, False, method=UNetResNet.encode)


def generate_predictions(model: UNetResNet, variables, images, rng,
                         temperature: float = 1.0, num_samples: int = 3,
                         train: bool = False) -> jnp.ndarray:
    """Mean decoder logits over `num_samples` tempered latent draws.

    Encoder runs once; the decoder ensemble is a single vmap over the sample
    axis (XLA batches the convs across samples on the MXU).  Matches the
    final value of reference vae_utils.generate_predictions (which averages
    its loop, :70-75).  When the model's strategy is 'none', z = mu.
    """
    mu, logvar, features = model.apply(
        variables, images, train, method=UNetResNet.encode_with_features)
    _, _, should_sample = _strategy(model)
    if should_sample or model.latent_injection != "none":
        zs = sample_latents(mu, logvar, rng, temperature, num_samples)
    else:
        zs = jnp.broadcast_to(mu[None], (num_samples, *mu.shape))
    out_hw = images.shape[1:3]

    def decode_one(z):
        return model.apply(variables, z, features, out_hw, train,
                           method=UNetResNet.decode_features)

    preds = jax.vmap(decode_one)(zs)  # [N, B, H, W, C]
    return jnp.mean(preds, axis=0)


def _strategy(model: UNetResNet):
    from vaeunet_tpu.models.vae_unet import resolve_injection
    return resolve_injection(model.latent_injection)


def calculate_latent_stats(mu: jnp.ndarray, logvar: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Posterior-collapse monitor.  (vae_utils.py:79-103)

    jit-safe: returns traced scalars; convert with float()/int() host-side.
    """
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    mean_mu = jnp.mean(mu, axis=0)
    var = jnp.exp(logvar)
    mean_var = jnp.mean(var, axis=0)
    active = ((jnp.abs(mean_mu) > 0.1) | (mean_var < 0.9) | (mean_var > 1.1))
    active_dims = jnp.sum(active)
    total_dims = mu.shape[1]
    kl_per_dim = 0.5 * (jnp.square(mean_mu) + mean_var
                        - jnp.mean(logvar, axis=0) - 1.0)
    return {
        "active_dims": active_dims,
        "total_dims": jnp.asarray(total_dims),
        "activity_ratio": active_dims / total_dims,
        "total_kl": jnp.sum(kl_per_dim),
        "mean_mu_abs": jnp.mean(jnp.abs(mean_mu)),
        "mean_var": jnp.mean(mean_var),
    }
