"""The jit'd train/eval steps — the hot path.

Rebuild of the reference inner loop (train.py:368-428) as a single compiled
XLA program per step:

- forward (+ BN batch-stat update) -> Dice+BCE (+focal) + beta*KL(free bits)
- gradient accumulation as a ``lax.scan`` over microbatches
  (train.py:400-411's Python-level accumulation, compiled)
- global-norm clip 1.0 + AdamW update (train.py:406-411)
- bf16 mixed precision by casting activations; params, BN stats and loss
  math stay fp32.  No GradScaler needed — bf16 has fp32's exponent range
  (replaces train.py:343's fp16 AMP machinery).

`beta` (the annealed KL weight) is a traced scalar argument so the host-side
KLAnnealer never triggers recompilation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vaeunet_tpu.losses import kl_with_free_bits, make_criterion
from vaeunet_tpu.metrics import get_all_metrics
from vaeunet_tpu.models.vae_unet import UNetResNet
from vaeunet_tpu.ops.resize import resize_bilinear
from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.state import TrainState, build_model, make_optimizer


def _forward_loss(model, criterion, config: TrainConfig, params, batch_stats,
                  images, masks, rng, beta):
    variables = {"params": params, "batch_stats": batch_stats}
    is_vae = isinstance(model, UNetResNet)
    if config.amp:
        images = images.astype(jnp.bfloat16)
    ds = is_vae and config.deep_supervision
    mutable = ["batch_stats", "intermediates"] if ds else ["batch_stats"]
    if is_vae:
        (logits, mu, logvar), mutated = model.apply(
            variables, images, train=True, rngs={"latent": rng},
            mutable=mutable)
    else:
        logits, mutated = model.apply(variables, images, train=True,
                                      mutable=mutable)
        mu = jnp.zeros((images.shape[0], 1), jnp.float32)
        logvar = jnp.zeros((images.shape[0], 1), jnp.float32)
    logits = logits.astype(jnp.float32)
    recon = criterion(logits, masks)
    if ds:
        # nnU-Net-style weighting: each coarser level carries half the
        # weight of the one above; normalize so the total stays a convex
        # combination (main at 512^2 keeps the largest share).
        inter = mutated["intermediates"]
        w, total_w = 1.0, 1.0
        for i in (2, 1, 0):       # 1/4 -> 1/16 resolution
            aux = inter[f"ds_logits_{i}"][0].astype(jnp.float32)
            w *= 0.5
            soft = resize_bilinear(masks.astype(jnp.float32),
                                   aux.shape[1:3], align_corners=False)
            recon = recon + w * criterion(aux, soft)
            total_w += w
        recon = recon / total_w
    kl = (kl_with_free_bits(mu, logvar, free_bits=config.free_bits,
                            clamp_leak=config.kl_clamp_leak)
          if is_vae else jnp.zeros(()))
    loss = recon + beta * kl
    aux = {"loss": loss, "recon_loss": recon, "kl_loss": kl,
           "mu": mu.astype(jnp.float32), "logvar": logvar.astype(jnp.float32)}
    return loss, (mutated["batch_stats"], aux)


def make_train_step(config: TrainConfig, model=None,
                    criterion: Optional[Callable] = None,
                    axis_name: Optional[str] = None,
                    augment: bool = False,
                    indexed: bool = False,
                    gather: Optional[Callable] = None,
                    jit: bool = True):
    """Build the train step.

    step(state, images, masks, beta) -> (state, aux)

    `indexed`: device-resident-data variant with signature
    step(state, data_images_u8, data_masks_u8, idx, beta) — the batch is
    gathered from the HBM-resident dataset and normalized inside the same
    compiled program (see data.device_cache), so the host never touches
    pixels during an epoch.  `gather` overrides the gather lowering
    (e.g. ImageDeviceCache.make_gather(): `idx` becomes [B,3] patch
    records sliced out of whole-image arrays); default is the flat
    patch-array jnp.take.

    `images` is [accum * micro_batch, H, W, C]; with
    config.gradient_accumulation_steps > 1 it is split into microbatches that
    are scanned sequentially (grads averaged, BN stats threaded), giving the
    reference's effective-batch semantics at constant memory.

    `augment`: fold the on-device augmentation policy into the same compiled
    program (the training loop enables this — one dispatch per step instead
    of two, and no HBM round trip between augment and forward).

    `axis_name`: when set, gradients/aux are psum-averaged across that mesh
    axis (data parallelism; used by vaeunet_tpu.parallel).
    """
    model = model or build_model(config)
    criterion = criterion or make_criterion(config.lesion_type, config.loss)
    tx = make_optimizer(config)
    accum = max(1, config.gradient_accumulation_steps)
    # Debug surface (--debug-nans): raise on the op that produced a NaN and
    # keep buffers un-donated so they can be inspected post-mortem. The
    # TPU-native analogue of the reference's pervasive NaN guards
    # (loss.py:12-14,152-168).
    donate = (0,)
    if config.debug_nans:
        jax.config.update("jax_debug_nans", True)
        donate = ()

    def step(state: TrainState, images, masks, beta):
        rng, new_rng = jax.random.split(state.rng)
        if axis_name is not None:
            # decorrelate the latent noise across data-parallel shards
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        if augment:
            from vaeunet_tpu.data.augment import augment_sample
            rng, aug_rng = jax.random.split(rng)
            keys = jax.random.split(aug_rng, images.shape[0])
            images, masks = jax.vmap(augment_sample)(keys, images, masks)
        grad_fn = jax.grad(
            functools.partial(_forward_loss, model, criterion, config),
            has_aux=True)

        if accum == 1:
            grads, (batch_stats, aux) = grad_fn(
                state.params, state.batch_stats, images, masks, rng, beta)
        else:
            b = images.shape[0]
            micro = b // accum
            assert micro * accum == b, (
                f"batch {b} not divisible by accumulation {accum}")
            im = images.reshape(accum, micro, *images.shape[1:])
            mk = masks.reshape(accum, micro, *masks.shape[1:])
            rngs = jax.random.split(rng, accum)

            def body(carry, xs):
                stats, grad_acc = carry
                images_i, masks_i, rng_i = xs
                g, (stats, aux_i) = grad_fn(state.params, stats, images_i,
                                            masks_i, rng_i, beta)
                grad_acc = jax.tree.map(jnp.add, grad_acc, g)
                return (stats, grad_acc), aux_i

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (batch_stats, grads), aux_scan = jax.lax.scan(
                body, (state.batch_stats, zero_grads), (im, mk, rngs))
            grads = jax.tree.map(lambda g: g / accum, grads)
            aux = {
                "loss": jnp.mean(aux_scan["loss"]),
                "recon_loss": jnp.mean(aux_scan["recon_loss"]),
                "kl_loss": jnp.mean(aux_scan["kl_loss"]),
                "mu": aux_scan["mu"].reshape(b, -1),
                "logvar": aux_scan["logvar"].reshape(b, -1),
            }

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = dict(aux)
            for k in ("loss", "recon_loss", "kl_loss"):
                aux[k] = jax.lax.pmean(aux[k], axis_name)
            batch_stats = jax.tree.map(
                lambda s: jax.lax.pmean(s, axis_name), batch_stats)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state,
                                  rng=new_rng)
        return new_state, aux

    if indexed:
        if gather is None:
            from vaeunet_tpu.data.device_cache import gather_batch_device
            gather = gather_batch_device

        def indexed_step(state, data_images, data_masks, idx, beta):
            images, masks = gather(data_images, data_masks, idx)
            return step(state, images, masks, beta)

        if jit:
            return jax.jit(indexed_step, donate_argnums=donate)
        return indexed_step

    if jit:
        return jax.jit(step, donate_argnums=donate)
    return step


def multi_temp_training_step(config: TrainConfig, model, variables, images,
                             true_masks, rng, temps=(1.0, 3.0),
                             weight: float = 0.3, num_samples: int = 3):
    """Multi-temperature training objective.

    Functional rebuild of reference ``train.py:137-160``
    (multi_temp_training_step) — dead code in the reference's loop but part
    of its public surface; here it actually works: standard loss blended
    with the mean criterion over tempered ensemble predictions.
    -> (total_loss, {'standard_loss', 'multi_temp_loss'})
    """
    from vaeunet_tpu.vae_utils import generate_predictions

    criterion = make_criterion(config.lesion_type)
    rngs = jax.random.split(rng, len(temps) + 1)
    if isinstance(model, UNetResNet):
        logits, _, _ = model.apply(variables, images, train=False,
                                   rngs={"latent": rngs[0]})
    else:
        logits = model.apply(variables, images, train=False)
    standard_loss = criterion(logits, true_masks)
    multi = jnp.zeros(())
    for t, key in zip(temps, rngs[1:]):
        pred = generate_predictions(model, variables, images, key,
                                    temperature=t, num_samples=num_samples)
        multi = multi + criterion(pred, true_masks)
    multi = multi / len(temps)
    total = (1 - weight) * standard_loss + weight * multi
    return total, {"standard_loss": standard_loss, "multi_temp_loss": multi}


def make_eval_step(config: TrainConfig, model=None,
                   apply_sigmoid_for_metrics: bool = False,
                   axis_name: Optional[str] = None,
                   indexed: bool = False,
                   gather: Optional[Callable] = None,
                   jit: bool = True):
    """Validation step rebuilding reference evaluate.py:20-101.

    eval_step(variables, images, masks, rng, valid=None) -> (metrics, logits)

    `valid` ([B] 0/1 mask) excludes loader-padded rows from the metrics so a
    padded final batch scores exactly like the reference's true-size batch
    (evaluate.py:39-99).  `indexed` swaps (images, masks) for
    (data_images_u8, data_masks_u8, idx) gathered on-device.

    Keeps the reference semantics: eval-mode BN (running stats) but a
    *sampled* z when the injection strategy samples (the reference's forward
    draws randn even under torch.inference_mode, evaluate.py:56-58), and
    metrics computed on raw logits at threshold 0.5 unless
    `apply_sigmoid_for_metrics` (the SURVEY.md section 2.4-2 quirk flag).
    Logits are bilinear-resized to the mask shape on mismatch
    (evaluate.py:66-73).
    """
    model = model or build_model(config)
    is_vae = isinstance(model, UNetResNet)

    def step(variables, images, masks, rng, valid=None):
        if config.amp:
            images = images.astype(jnp.bfloat16)
        if is_vae:
            logits, _, _ = model.apply(variables, images, train=False,
                                       rngs={"latent": rng})
        else:
            logits = model.apply(variables, images, train=False)
        logits = logits.astype(jnp.float32)
        if logits.shape[1:3] != masks.shape[1:3]:
            logits = resize_bilinear(logits, masks.shape[1:3], align_corners=True)
        metrics = get_all_metrics(logits, masks,
                                  apply_sigmoid=apply_sigmoid_for_metrics,
                                  valid=valid)
        if axis_name is not None:
            metrics = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}
        return metrics, logits

    if indexed:
        if gather is None:
            from vaeunet_tpu.data.device_cache import gather_batch_device
            gather = gather_batch_device

        def indexed_step(variables, data_images, data_masks, idx, rng, valid):
            images, masks = gather(data_images, data_masks, idx)
            return step(variables, images, masks, rng, valid)

        if jit:
            return jax.jit(indexed_step)
        return indexed_step

    if jit:
        return jax.jit(step)
    return step
