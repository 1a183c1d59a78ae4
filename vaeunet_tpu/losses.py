"""Segmentation losses + KL machinery, pure jnp.

Rebuild of reference ``utils/loss.py``:
- dice_loss            <- loss.py:6-28   (sigmoid, flatten, smooth=1,
                          clamped sums, NaN guard)
- combined_loss        <- loss.py:44-63  (0.5*BCEwithLogits + 0.5*dice)
- ma_focal_loss        <- loss.py:66-92  (alpha=.8 default, gamma=2)
- ma_segmentation_loss <- loss.py:95-111 (0.5*dice + 0.5*focal(alpha=.9))
- KLAnnealer           <- loss.py:114-145
- kl_with_free_bits    <- loss.py:148-170
- focal_loss           <- utils/metrics.py:150-172 (secondary variant)

All functions are jit-safe (no data-dependent control flow) and reduce to
scalars in fp32 regardless of input dtype, so they drop straight into a bf16
train step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _nan_to_num01(x):
    """nan->0, +inf->1, -inf->0 (reference loss.py:14,79)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Soft Dice loss on sigmoid probabilities.  (loss.py:6-28)"""
    probs = _nan_to_num01(jax.nn.sigmoid(logits.astype(jnp.float32)))
    probs = probs.reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(probs * targets)
    probs_sum = jnp.maximum(jnp.sum(probs), smooth / 2.0)
    targets_sum = jnp.maximum(jnp.sum(targets), smooth / 2.0)
    dice = (2.0 * intersection + smooth) / (probs_sum + targets_sum + smooth)
    return 1.0 - dice


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy from logits, the numerically stable
    log-sum-exp form used by ``F.binary_cross_entropy_with_logits``."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*t + log(1+exp(-|x|))
    loss = (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.mean(loss)


def combined_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  bce_weight: float = 0.5, dice_weight: float = 0.5) -> jnp.ndarray:
    """BCE + Dice combination.  (loss.py:44-63)"""
    return (bce_weight * bce_with_logits(logits, targets)
            + dice_weight * dice_loss(logits, targets))


def ma_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  alpha: float = 0.8, gamma: float = 2.0,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Focal loss tuned for microaneurysms.  (loss.py:66-92)"""
    probs = _nan_to_num01(jax.nn.sigmoid(logits.astype(jnp.float32)))
    targets = targets.astype(jnp.float32)
    p_t = targets * probs + (1 - targets) * (1 - probs)
    focal_weight = jnp.power(1 - p_t, gamma)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    bce = (-targets * jnp.log(probs + eps)
           - (1 - targets) * jnp.log(1 - probs + eps))
    loss = _nan_to_num01(alpha_t * focal_weight * bce)
    return jnp.mean(loss)


def ma_segmentation_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         dice_weight: float = 0.5, focal_weight: float = 0.5,
                         focal_gamma: float = 2.0,
                         class_weight: float = 0.9) -> jnp.ndarray:
    """Dice + focal combination for MA lesions.  (loss.py:95-111)"""
    return (dice_weight * dice_loss(logits, targets)
            + focal_weight * ma_focal_loss(logits, targets,
                                           alpha=class_weight,
                                           gamma=focal_gamma))


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               alpha: float = 0.8, gamma: float = 2.0,
               eps: float = 1e-6) -> jnp.ndarray:
    """Secondary focal-loss variant.  (utils/metrics.py:150-172)"""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    bce = (-targets * jnp.log(probs + eps)
           - (1 - targets) * jnp.log(1 - probs + eps))
    pt = jnp.where(targets == 1, probs, 1 - probs)
    alpha_weight = jnp.where(targets == 1, alpha, 1 - alpha)
    return jnp.mean(alpha_weight * jnp.power(1 - pt, gamma) * bce)


def kl_with_free_bits(mu: jnp.ndarray, logvar: jnp.ndarray,
                      free_bits: float = 1e-4,
                      clamp_leak: float = 0.0) -> jnp.ndarray:
    """KL(q(z|x) || N(0,1)) with per-dimension free bits.  (loss.py:148-170)

    per-dim KL = 0.5*(mu^2 + e^logvar - logvar - 1), clamped to [-100, 100],
    floored at `free_bits`, summed over dims, averaged over batch.

    `clamp_leak` (default 0 = reference parity): the reference's hard clamp
    zeroes the gradient of any dimension whose KL exceeds 100, so a runaway
    logvar has NO restoring force and can random-walk to e^30 variance
    (observed: scale-1.0 training diverged to latent var ~3e10 in one
    epoch).  With clamp_leak > 0 the clamped VALUE is unchanged but a
    `clamp_leak`-scaled gradient of the excess passes through, giving
    out-of-range dimensions a pull back toward the rails.
    """
    mu = jnp.nan_to_num(mu.astype(jnp.float32), nan=0.0)
    logvar = jnp.nan_to_num(logvar.astype(jnp.float32), nan=0.0)
    kl_per_dim = 0.5 * (jnp.square(mu) + jnp.exp(logvar) - logvar - 1.0)
    clipped = jnp.clip(kl_per_dim, -100.0, 100.0)
    if clamp_leak > 0:
        excess = kl_per_dim - clipped  # 0 inside the rails
        clipped = clipped + clamp_leak * (
            excess - jax.lax.stop_gradient(excess))
    kl_per_dim = clipped
    if free_bits > 0:
        kl_per_dim = jnp.maximum(kl_per_dim, free_bits)
    kl = jnp.mean(jnp.sum(kl_per_dim, axis=1))
    return jnp.nan_to_num(kl, nan=1e-8)


@dataclass
class KLAnnealer:
    """Anneals the KL weight (beta) over warm-up epochs.  (loss.py:114-145)

    Host-side controller: call ``get_weight(epoch)`` each epoch and feed the
    scalar into the jit'd train step as an argument.
    """

    kl_start: float = 0.0
    kl_end: float = 1.0
    warmup_epochs: int = 10
    strategy: str = "linear"  # 'linear' | 'cyclical' | 'constant'

    def get_weight(self, epoch: float, batch: int | None = None,
                   num_batches: int | None = None) -> float:
        if self.strategy == "constant":
            return self.kl_end
        if batch is not None and num_batches is not None:
            progress = (epoch + batch / num_batches) / self.warmup_epochs
        else:
            progress = epoch / self.warmup_epochs
        progress = min(progress, 1.0)
        if self.strategy == "linear":
            return self.kl_start + progress * (self.kl_end - self.kl_start)
        if self.strategy == "cyclical":
            cycle = progress % 1.0
            return self.kl_start + cycle * (self.kl_end - self.kl_start)
        return self.kl_end


def multichannel_combined_loss(logits: jnp.ndarray,
                               targets: jnp.ndarray) -> jnp.ndarray:
    """Mean over mask channels of the BCE+Dice combination — the multi-task
    'ALL' training loss (framework extension; the reference trains one
    lesion family per run, train.py:312-316).  Per-channel Dice keeps the
    gradient share of sparse families (MA dots) from being swamped by the
    large-area ones (OD): a single flattened Dice over all channels would
    be dominated by whichever channel has the most mass."""
    n = logits.shape[-1]
    per = [combined_loss(logits[..., i], targets[..., i]) for i in range(n)]
    return jnp.mean(jnp.stack(per))


def make_criterion(lesion_type: str, override: str = "auto"):
    """Loss selection rule from the reference train loop (train.py:312-316):
    MA gets the specialized focal+dice loss, everything else BCE+dice.

    ``override`` (TPU-native addition, ``--loss``): 'auto' keeps the
    reference rule; 'combined' / 'focal' force the respective loss for any
    lesion type — focal+dice concentrates gradient on hard small-lesion
    pixels (e.g. the scattered-dot EX regime the ImageNet-pretrained
    reference encoder handles natively)."""
    if override == "combined":
        return combined_loss
    if override == "focal" or (override == "auto" and lesion_type == "MA"):
        return lambda logits, targets: ma_segmentation_loss(
            logits, targets, class_weight=0.9)
    if lesion_type == "ALL":
        return multichannel_combined_loss
    return combined_loss
