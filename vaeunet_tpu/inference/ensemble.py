"""Multi-model (cross-scale) probability fusion.

The reference ships one model per lesion type and leans on its
ImageNet-pretrained encoder to handle both tiny scattered lesions and
confluent plaques (unet_resnet.py:131-137).  In this from-scratch setting
the two regimes are covered by models trained at different scales; this
module fuses their per-image mean probability maps at native resolution.

Measured on the EX test split (scripts/eval_scale_ensemble.py, RESULTS.md
round 2): max-fusion of the 0.5x and 1.0x models lifts every test image
over either single model (mean Dice 0.674 vs 0.647 / 0.610).

Each member is itself an N-sample tempered latent ensemble
(``segmentation_distribution``), so fusion composes with the uncertainty
machinery: per-member sample stacks are returned for downstream
uncertainty maps.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vaeunet_tpu.inference.predict import segmentation_distribution
from vaeunet_tpu.ops.resize import resize_bilinear

_FUSIONS = ("max", "mean")


def fused_probability(members: Sequence[Tuple[object, object, jnp.ndarray]],
                      rng: jax.Array,
                      *,
                      num_samples: int = 10,
                      temperature: float = 1.0,
                      patch_size: Optional[int] = None,
                      tile_batch: int = 8,
                      out_hw: Optional[Tuple[int, int]] = None,
                      fusion: str = "max"):
    """Fuse mean probability maps from several (model, variables, image)
    members into one [H, W, 1] map.

    Each member's ``image`` may be at a different scale; its mean
    probability map is bilinearly resized (align_corners=False — the data
    pipeline's convention, utils/data_loading.py:518-529) to ``out_hw``
    (default: the first member's image size) before fusion.

    Returns ``(fused [H,W,1], member_means [M,H,W,1])``.
    """
    if fusion not in _FUSIONS:
        raise ValueError(f"fusion must be one of {_FUSIONS}, got {fusion!r}")
    if not members:
        raise ValueError("need at least one ensemble member")
    if out_hw is None:
        out_hw = tuple(members[0][2].shape[:2])

    means = []
    for model, variables, image in members:
        rng, sub = jax.random.split(rng)
        samples, _, _ = segmentation_distribution(
            model, variables, image, sub, num_samples=num_samples,
            temperature=temperature, patch_size=patch_size,
            tile_batch=tile_batch)
        mean = jnp.mean(samples, axis=0)                   # [h, w, 1]
        if tuple(mean.shape[:2]) != tuple(out_hw):
            mean = resize_bilinear(mean, out_hw, align_corners=False)
        means.append(mean)

    stack = jnp.stack(means)                               # [M, H, W, 1]
    if fusion == "max":
        fused = jnp.max(stack, axis=0)
    else:
        fused = jnp.mean(stack, axis=0)
    return fused, stack


def expected_area_threshold(prob, area_factor: float = 1.0) -> float:
    """Per-image decision threshold from the map's own soft mass.

    Picks the threshold t such that the predicted area ``|{p > t}|`` is the
    largest count not exceeding ``area_factor * sum(p)`` — the
    calibration-consistent estimate of lesion area.  A framework extension
    (the reference thresholds every map at a global 0.5,
    analyze_model.py:884-886): on an under-confident image the soft mass is
    dominated by the low-probability halo, so the threshold lands just
    above the halo and keeps the confident cores, where a *global* low
    threshold floods false positives on confident images.  Measured on the
    EX test split it recovers the tiny-scattered-lesion image the fixed
    rule misses (RESULTS.md round 2).  Host-side numpy — decision
    thresholds are offline analysis work.
    """
    import numpy as np

    flat = np.asarray(prob, dtype=np.float32).reshape(-1)
    target = float(area_factor) * float(flat.sum())
    n = min(int(target), flat.size)
    if n <= 0:
        return 1.0
    # threshold at the n-th largest probability: |{p > t}| <= n by
    # construction (ties at t are excluded)
    t = float(np.partition(flat, flat.size - n)[flat.size - n])
    return t
