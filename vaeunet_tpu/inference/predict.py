"""Whole-image prediction + N-sample segmentation distributions.

- predict_full_image          <- visualize_vae.py:61-87
- segmentation_distribution   <- visualize_vae.py:578-652
  (get_segmentation_distribution_from_image: encode once, draw N tempered
  latents, predict per sample — here the samples are vmapped/fused)
- uncertainty_maps            <- visualize_vae.py:90-117
  (mean/std/entropy/mutual-information/coefficient-of-variation)
- predict_image               <- the milesial-style predict CLI behavior
  (scale -> forward -> sigmoid -> threshold), BASELINE config 1
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vaeunet_tpu.models.vae_unet import UNetResNet
from vaeunet_tpu.inference.tiled import predict_tiled_ensemble
from vaeunet_tpu.vae_utils import sample_latents


@functools.partial(jax.jit, static_argnums=(0,))
def predict_full_image(model: UNetResNet, variables, image: jnp.ndarray,
                       z: jnp.ndarray) -> jnp.ndarray:
    """Single forward with an externally-supplied latent: encoder ->
    decode(z) -> sigmoid, output resized to the input size.
    image [H,W,C] or [B,H,W,C]; z [B,D].  (visualize_vae.py:61-87)

    jit'd with the model static: on the tunneled TPU backend, eager
    dispatch costs ~30ms/op — everything public here must be compiled.
    """
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    mu, logvar, features = model.apply(
        variables, image, False, method=UNetResNet.encode_with_features)
    logits = model.apply(variables, z, features, image.shape[1:3], False,
                         method=UNetResNet.decode_features)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return probs if batched else probs[0]


@functools.partial(jax.jit, static_argnums=(0, 3))
def predict_image(model, variables, image: jnp.ndarray,
                  out_threshold: float = 0.5,
                  rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain predict: (probs, binary mask) for one [H,W,C] image.

    For the plain UNet this is the milesial predict.py behavior (sigmoid >
    threshold); for the VAE-UNet the deterministic z=mu path is used unless
    an rng is given.
    """
    x = image[None] if image.ndim == 3 else image
    if isinstance(model, UNetResNet):
        if rng is None:
            logits, _, _ = model.apply(variables, x, train=False, sample=False)
        else:
            logits, _, _ = model.apply(variables, x, train=False,
                                       rngs={"latent": rng})
    else:
        logits = model.apply(variables, x, train=False)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    mask = probs > out_threshold
    if image.ndim == 3:
        probs, mask = probs[0], mask[0]
    return probs, mask


@functools.partial(jax.jit, static_argnums=(0, 4, 6, 7, 8))
def segmentation_distribution(model: UNetResNet, variables, image: jnp.ndarray,
                              rng: jax.Array, num_samples: int = 5,
                              temperature: float = 1.0,
                              patch_size: Optional[int] = None,
                              tile_batch: int = 8,
                              overlap: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (samples [N,H,W,1] sigmoid maps, mu, logvar) for one [H,W,C] image.

    Encode once; draw N tempered latents; decode per sample — tiled when
    `patch_size` is given (and the image is larger), full otherwise.
    `overlap` overrides the adaptive tile overlap (the reference forwards
    its --overlap flag here, analyze_model.py:787).
    (visualize_vae.py:578-652)
    """
    h, w = image.shape[0], image.shape[1]
    mu, logvar = model.apply(variables, image[None], False,
                             method=UNetResNet.encode)
    zs = sample_latents(mu, logvar, rng, temperature, num_samples)[:, 0]

    if patch_size is not None and (h > patch_size or w > patch_size):
        samples = predict_tiled_ensemble(model, variables, image, zs,
                                         patch_size, overlap=overlap,
                                         batch_size=tile_batch)
    else:
        _, _, features = model.apply(variables, image[None], False,
                                     method=UNetResNet.encode_with_features)

        def one(z):
            logits = model.apply(variables, z[None], features, (h, w), False,
                                 method=UNetResNet.decode_features)
            return jax.nn.sigmoid(logits.astype(jnp.float32))[0]

        samples = jax.lax.map(one, zs)
    return samples, mu[0], logvar[0]


def uncertainty_maps(samples: jnp.ndarray, eps: float = 1e-8) -> Dict[str, jnp.ndarray]:
    """Per-pixel uncertainty decomposition from [N,H,W,1] sigmoid samples.
    (visualize_vae.py:90-117)

    entropy   = H(mean p)                     (total uncertainty)
    exp_entropy = mean_i H(p_i)               (aleatoric)
    mutual_info = entropy - exp_entropy       (epistemic)
    cv        = std / (mean + eps)
    """
    mean = jnp.mean(samples, axis=0)
    std = jnp.std(samples, axis=0)

    def binary_entropy(p):
        p = jnp.clip(p, eps, 1 - eps)
        return -(p * jnp.log(p) + (1 - p) * jnp.log(1 - p))

    entropy = binary_entropy(mean)
    exp_entropy = jnp.mean(binary_entropy(samples), axis=0)
    return {
        "mean": mean,
        "std": std,
        "entropy": entropy,
        "mutual_info": entropy - exp_entropy,
        "cv": std / (mean + eps),
    }
