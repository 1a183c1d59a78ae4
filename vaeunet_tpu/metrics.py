"""Thresholded evaluation metrics, pure jnp.

Rebuild of reference ``utils/metrics.py``:
- dice_score        <- metrics.py:8-35
- iou_score         <- metrics.py:50-58
- precision_recall  <- metrics.py:61-73
- specificity       <- metrics.py:76-84
- accuracy          <- metrics.py:87-95
- get_all_metrics   <- metrics.py:98-117
- MetricTracker     <- metrics.py:120-147

Reference quirk (SURVEY.md section 2.4-2): validation calls get_all_metrics on
**raw logits**, so the >0.5 threshold is effectively sigmoid>0.622.  We keep
that behavior when ``apply_sigmoid=False`` (parity default, matching
evaluate.py:76) and expose the fixed behavior behind the flag.

All metrics are jit-safe and return fp32 scalars; aggregate across a device
mesh with ``jax.lax.psum`` of the (intersection, sums) pairs rather than the
ratios (see vaeunet_tpu.parallel).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _binarize(pred: jnp.ndarray, target: jnp.ndarray,
              apply_sigmoid: bool = False, valid=None):
    """-> flat (pred01, target01, weight01).

    `valid` is an optional [B] per-sample mask excluding padded rows (the
    loader repeats samples to keep XLA shapes static); masked metrics equal
    the unpadded computation exactly — the reference evaluates true-size
    final batches (evaluate.py:39-99)."""
    pred = pred.astype(jnp.float32)
    if apply_sigmoid:
        pred = jax.nn.sigmoid(pred)
    p = (pred > 0.5).astype(jnp.float32)
    t = (target.astype(jnp.float32) > 0.5).astype(jnp.float32)
    if valid is None:
        w = jnp.ones(p.size, jnp.float32)
    else:
        per = p.size // p.shape[0]
        w = jnp.repeat(valid.astype(jnp.float32), per)
        p = p.reshape(-1) * w
        t = t.reshape(-1) * w
        return p, t, w
    return p.reshape(-1), t.reshape(-1), w


def dice_score(pred: jnp.ndarray, target: jnp.ndarray,
               epsilon: float = 1e-6, apply_sigmoid: bool = False,
               valid=None) -> jnp.ndarray:
    """Hard Dice at threshold 0.5; returns 1.0 when both sides are empty
    (metrics.py:32-33)."""
    p, t, _ = _binarize(pred, target, apply_sigmoid, valid)
    intersection = jnp.sum(p * t)
    denominator = jnp.sum(p) + jnp.sum(t)
    dice = (2.0 * intersection + epsilon) / (denominator + epsilon)
    return jnp.where(denominator == 0, 1.0, dice)


def multiclass_dice_score(pred: jnp.ndarray, target: jnp.ndarray,
                          epsilon: float = 1e-6,
                          apply_sigmoid: bool = False) -> jnp.ndarray:
    """Average Dice over classes by flattening the class axis into the batch
    (metrics.py:38-41)."""
    return dice_score(pred.reshape(-1, *pred.shape[2:]),
                      target.reshape(-1, *target.shape[2:]),
                      epsilon, apply_sigmoid)


def dice_loss_metric(pred: jnp.ndarray, target: jnp.ndarray,
                     multiclass: bool = False) -> jnp.ndarray:
    """1 - hard dice (the metrics-module dice_loss variant, metrics.py:44-47;
    the trainable soft version lives in vaeunet_tpu.losses)."""
    fn = multiclass_dice_score if multiclass else dice_score
    return 1.0 - fn(pred, target)


def iou_score(pred, target, epsilon: float = 1e-6, apply_sigmoid: bool = False,
              valid=None):
    p, t, _ = _binarize(pred, target, apply_sigmoid, valid)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - intersection
    return (intersection + epsilon) / (union + epsilon)


def precision_recall(pred, target, epsilon: float = 1e-6,
                     apply_sigmoid: bool = False, valid=None):
    p, t, _ = _binarize(pred, target, apply_sigmoid, valid)
    tp = jnp.sum(p * t)
    fp = jnp.sum(p) - tp
    fn = jnp.sum(t) - tp
    precision = (tp + epsilon) / (tp + fp + epsilon)
    recall = (tp + epsilon) / (tp + fn + epsilon)
    return precision, recall


def specificity(pred, target, epsilon: float = 1e-6, apply_sigmoid: bool = False,
                valid=None):
    p, t, w = _binarize(pred, target, apply_sigmoid, valid)
    # tn over valid pixels only: w - p - t + p*t (p,t are already masked)
    tn = jnp.sum(w) - jnp.sum(p) - jnp.sum(t) + jnp.sum(p * t)
    fp = jnp.sum(p) - jnp.sum(p * t)
    return (tn + epsilon) / (tn + fp + epsilon)


def accuracy(pred, target, apply_sigmoid: bool = False, valid=None):
    p, t, w = _binarize(pred, target, apply_sigmoid, valid)
    eq = (p == t).astype(jnp.float32)
    return jnp.sum(w * eq) / jnp.sum(w)


def get_all_metrics(pred: jnp.ndarray, target: jnp.ndarray,
                    epsilon: float = 1e-6,
                    apply_sigmoid: bool = False,
                    valid=None) -> Dict[str, jnp.ndarray]:
    """dice/iou/precision/recall/specificity/accuracy at threshold 0.5.
    (metrics.py:98-117).  jit-safe: returns traced scalars, not floats.
    `valid` ([B] mask) excludes loader-padded rows without a recompile."""
    prec, rec = precision_recall(pred, target, epsilon, apply_sigmoid, valid)
    return {
        "dice": dice_score(pred, target, epsilon, apply_sigmoid, valid),
        "iou": iou_score(pred, target, epsilon, apply_sigmoid, valid),
        "precision": prec,
        "recall": rec,
        "specificity": specificity(pred, target, epsilon, apply_sigmoid, valid),
        "accuracy": accuracy(pred, target, apply_sigmoid, valid),
    }


class MetricTracker:
    """Best-dice bookkeeping across train/val phases.  (metrics.py:120-147)"""

    STANDARD = ("loss", "dice", "iou", "precision", "recall",
                "specificity", "accuracy")

    def __init__(self):
        self.metrics = {phase: {m: [] for m in self.STANDARD}
                        for phase in ("train", "val")}
        self.best_dice = 0.0

    def update(self, phase: str, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self.metrics[phase].setdefault(k, []).append(float(v))

    def get_current(self, phase: str) -> Dict[str, float]:
        return {k: (v[-1] if v else 0.0) for k, v in self.metrics[phase].items()}

    def is_best_dice(self, current_dice: float) -> bool:
        if current_dice > self.best_dice:
            self.best_dice = float(current_dice)
            return True
        return False
