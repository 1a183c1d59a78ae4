"""Training orchestration — rebuild of reference ``train.py:163-621`` and
``evaluate.py:20-101``.

Control flow kept for parity:
- KL-annealed beta per epoch (train.py:374)
- twice-per-epoch validation (mid + end, train.py:436)
- ReduceLROnPlateau on validation dice (train.py:504-506)
- best-dice checkpointing with full state + hyperparameter-encoded dir
  (train.py:509-568) — plus *true resume* the reference lacks
- early stopping counted per validation (train.py:570-579)
- latent posterior-collapse stats each epoch (train.py:588-612)

TPU-native differences:
- one jit'd train step (grad-accum scanned inside), on-device augmentation
- no GradScaler / autocast dance: bf16 activations, fp32 params & loss
- no CUDA-OOM retry loop: memory is static at trace time; `use_remat` is the
  ahead-of-time lever (SURVEY.md section 5, failure-detection row)
"""

from __future__ import annotations

import logging
import shutil
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vaeunet_tpu.data.dataset import IDRIDDataset
from vaeunet_tpu.data.loader import Loader
from vaeunet_tpu.losses import KLAnnealer
from vaeunet_tpu.training.checkpoint import save_checkpoint
from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.schedule import ReduceLROnPlateau
from vaeunet_tpu.training.state import (TrainState, create_train_state,
                                        get_learning_rate, set_learning_rate)
from vaeunet_tpu.training.step import make_eval_step, make_train_step
from vaeunet_tpu.utils.tracking import Tracker
from vaeunet_tpu.vae_utils import calculate_latent_stats

log = logging.getLogger(__name__)


def evaluate_model(eval_step, variables, loader: Loader, rng,
                   max_samples: int = 4,
                   device_data=None, stager=None) -> Tuple[Dict[str, float], List]:
    """Average metrics over batches + collect <=max_samples visualization
    triples (image, pred_probs, mask).  (evaluate.py:20-101)

    Padded rows of the final batch are excluded from the metrics via a
    validity mask, so each per-batch metric equals the reference's
    true-size-batch computation (evaluate.py:39-99); batches are then
    averaged with equal weight exactly as the reference does.

    `device_data`: a data.device_cache.DeviceCache — batches arrive as
    index vectors and are gathered on-device by the indexed eval step.
    Metric scalars stay on device until one fetch at the end (each host
    round-trip costs ~30ms on the tunneled backend).
    """
    per_batch: List[Dict] = []
    samples = []
    b = loader.batch_size
    # one device buffer per distinct count (only the final partial batch
    # differs) instead of a fresh ~100 B H2D transfer per batch — the same
    # unmanaged-feed class the StreamingStager bounds (ADVICE r3)
    valid_cache: Dict[int, jnp.ndarray] = {}
    for batch in loader:
        rng, sub = jax.random.split(rng)
        count = int(batch["count"])
        if count not in valid_cache:
            valid_cache[count] = jnp.asarray(
                (np.arange(b) < count).astype(np.float32))
        valid = valid_cache[count]
        if device_data is not None:
            idx = jnp.asarray(device_data.batch_indices(batch["idx"]))
            metrics, logits = eval_step(variables, device_data.images,
                                        device_data.masks, idx, sub, valid)
        else:
            if stager is not None:
                b_img, b_msk = stager.stage(batch["image"], batch["mask"])
            else:
                b_img = jnp.asarray(batch["image"])
                b_msk = jnp.asarray(batch["mask"])
            metrics, logits = eval_step(variables, b_img, b_msk, sub, valid)
        per_batch.append(metrics)
        if len(samples) < max_samples:
            take = min(max_samples - len(samples), count)
            # one indexed fetch for all viz rows of this batch (each device
            # round-trip costs ~30 ms on the tunneled backend)
            probs = np.asarray(jax.nn.sigmoid(logits[:take]))
            if device_data is not None:
                imgs, masks = device_data.fetch(batch["idx"][:take])
                ids = [device_data.img_ids[int(batch["idx"][i])]
                       for i in range(take)]
            else:
                imgs = np.asarray(batch["image"][:take])
                masks = np.asarray(batch["mask"][:take])
                ids = [batch["img_id"][i] for i in range(take)]
            samples.extend(
                (imgs[i], probs[i], masks[i], ids[i]) for i in range(take))
    if not per_batch:
        return {}, []
    # one host fetch for the whole pass
    stacked = jax.tree.map(lambda *v: jnp.stack(v), *per_batch)
    fetched = jax.device_get(stacked)
    return {k: float(np.mean(v)) for k, v in fetched.items()}, samples


def train_model(config: TrainConfig,
                variables: Optional[Dict[str, Any]] = None,
                tracker: Optional[Tracker] = None,
                train_dataset=None, val_dataset=None,
                train_step=None, eval_step=None,
                place_batch=None,
                resume_from: Optional[str] = None) -> TrainState:
    rng = jax.random.PRNGKey(config.seed)

    if config.lesion_type == "ALL" and config.n_classes == 1:
        # multi-task training: one output channel per lesion family
        from vaeunet_tpu.data.dataset import LESION_TYPES
        config.n_classes = len(LESION_TYPES)
        log.info("lesion_type=ALL: n_classes set to %d", config.n_classes)

    if train_dataset is None or val_dataset is None:
        if config.dataset_type == "basic":
            # Carvana-style layout: <data_dir>/imgs/{train,val} +
            # <data_dir>/masks/{train,val} with <id><mask_suffix>.* masks
            from vaeunet_tpu.data.generic import BasicDataset
            make = lambda split: BasicDataset(
                f"{config.data_dir}/imgs/{split}",
                f"{config.data_dir}/masks/{split}",
                scale=config.img_scale, mask_suffix=config.mask_suffix,
                max_images=config.max_images)
            train_dataset = train_dataset or make("train")
            val_dataset = val_dataset or make("val")
        else:
            train_dataset = train_dataset or IDRIDDataset(
                config.data_dir, split="train", scale=config.img_scale,
                patch_size=config.patch_size, lesion_type=config.lesion_type,
                max_images=config.max_images, balance_seed=config.seed,
                oversample_lesion=config.oversample_lesion)
            val_dataset = val_dataset or IDRIDDataset(
                config.data_dir, split="val", scale=config.img_scale,
                patch_size=config.patch_size, lesion_type=config.lesion_type,
                max_images=config.max_images)
    if len(train_dataset) == 0 or len(val_dataset) == 0:
        raise RuntimeError(f"Empty dataset for lesion type {config.lesion_type}")

    log.info("Dataset sizes: train=%d val=%d", len(train_dataset), len(val_dataset))

    # Device-resident data (data.device_cache): upload all patches to HBM
    # once as uint8; epochs then never move pixels over the host link
    # (measured: 92s/epoch of H2D at scale 0.5 / patch 512 without this).
    # Host-loader fallback for custom steps (DP), explicit placement, or
    # datasets too large for HBM.
    device_train = device_val = None
    if (config.device_cache and train_step is None and eval_step is None
            and place_batch is None and config.num_devices <= 1):
        from vaeunet_tpu.data.device_cache import (
            DeviceCache, ImageDeviceCache, estimate_bytes,
            estimate_image_bytes)
        est_img_t = estimate_image_bytes(train_dataset)
        est_img_v = estimate_image_bytes(val_dataset)
        est_patch = estimate_bytes(train_dataset) + estimate_bytes(val_dataset)
        if (est_img_t is not None and est_img_v is not None
                and est_img_t + est_img_v <= config.device_cache_max_bytes
                and est_img_t + est_img_v < est_patch):
            # whole-image layout: each source image stored once, patches
            # sliced on-device — always smaller than patch layout for
            # 50%-overlap grids, and oversampling replicas are free
            device_train = ImageDeviceCache(train_dataset)
            device_val = ImageDeviceCache(val_dataset)
            log.info("Device-resident data (image-level): %.0f MB in HBM",
                     (est_img_t + est_img_v) / 1e6)
        elif est_patch <= config.device_cache_max_bytes:
            device_train = DeviceCache(train_dataset)
            device_val = DeviceCache(val_dataset)
            log.info("Device-resident data: %.0f MB resident in HBM",
                     est_patch / 1e6)
        else:
            log.info("Device cache skipped: %.1f GB exceeds limit",
                     est_patch / 1e9)
    stager = None
    if device_train is None and jax.default_backend() not in ("cpu",):
        # The host-fed path re-stages every batch over the device link; the
        # StreamingStager bounds each transfer buffer's lifetime so the
        # client-side staging RSS stays flat (the unmanaged per-step
        # jnp.asarray feed leaked ~86 MB/step at scale 1.0 on the tunneled
        # backend — host OOM after ~1.5k steps; scripts/hostfed_smoke.py
        # measures the managed path).  The device cache is still the fast
        # path: staging re-sends every batch over the link.
        from vaeunet_tpu.data.device_cache import StreamingStager
        stager = StreamingStager()
        log.info(
            "Host-fed batches on backend %r: streaming staging enabled "
            "(bounded-lifetime H2D buffers).  For peak throughput raise "
            "--device-cache-max-bytes so the dataset fits in HBM "
            "(image-level cache needs only the unique source images).",
            jax.default_backend())

    eff_batch = config.batch_size * max(1, config.gradient_accumulation_steps)
    train_loader = Loader(train_dataset, eff_batch, shuffle=True,
                          seed=config.seed, index_only=device_train is not None)
    val_loader = Loader(val_dataset, config.batch_size, shuffle=False,
                        drop_last=False, index_only=device_val is not None)
    if len(train_loader) == 0:
        raise RuntimeError(
            f"Train set smaller than effective batch ({eff_batch})")

    tracker = tracker or Tracker(config=dict(
        epochs=config.epochs, batch_size=config.batch_size,
        learning_rate=config.learning_rate, img_scale=config.img_scale,
        amp=config.amp, patch_size=config.patch_size, classes=config.n_classes,
        lesion_type=config.lesion_type, backbone=config.backbone,
        pretrained=config.pretrained, seed=config.seed))

    if hasattr(train_dataset, "patch_size"):
        hw = (train_dataset.patch_size, train_dataset.patch_size)
    else:
        hw = tuple(train_dataset[0]["image"].shape[:2])
    state_rng, eval_rng, rng = jax.random.split(rng, 3)
    state = create_train_state(config, state_rng, hw, variables=variables)
    # default steps fold the augmentation policy into the compiled program;
    # custom steps (e.g. the DP factory) are expected to do the same
    train_step = train_step or make_train_step(
        config, augment=True, indexed=device_train is not None,
        gather=device_train.make_gather() if device_train else None)
    eval_step = eval_step or make_eval_step(
        config, indexed=device_val is not None,
        gather=device_val.make_gather() if device_val else None)

    annealer = KLAnnealer(kl_start=0.0, kl_end=config.beta,
                          warmup_epochs=config.kl_anneal_epochs)
    scheduler = ReduceLROnPlateau.for_lesion(config.lesion_type)
    if config.lr_patience is not None:
        scheduler.patience = config.lr_patience
    if config.lr_factor is not None:
        scheduler.factor = config.lr_factor
    is_vae = config.model_type == "resnet"

    best_val_score = float("-inf")
    no_improvement = 0
    global_step = 0
    start_epoch = 1
    run_dir = config.checkpoint_path()

    if resume_from:
        # TRUE resume (the capability the reference lacks, SURVEY.md sec. 5):
        # params, BN stats, optimizer moments, PRNG and step round-trip,
        # plus host-side controller state.
        from vaeunet_tpu.training.checkpoint import restore_checkpoint
        state, host = restore_checkpoint(resume_from, state)
        if not config.reset_best:
            best_val_score = host.get("best_val_score", best_val_score)
            no_improvement = host.get("no_improvement", 0)
        global_step = host.get("global_step", int(state.step))
        start_epoch = host.get("epoch", 0) + 1
        if "scheduler" in host:
            scheduler.load_state_dict(host["scheduler"])
        log.info("Resumed from %s at epoch %d (step %d, best dice %.4f)",
                 resume_from, start_epoch, global_step, best_val_score)
        # A resumed run that keeps improving will overwrite <run_dir>/best —
        # but "better val dice" does not guarantee a better model (a later
        # checkpoint can overfit a small train set; measured in RESULTS.md
        # round 2).  Keep the restored-from weights recoverable.
        src = Path(resume_from) / "best"
        if (src.resolve() == (Path(run_dir) / "best").resolve()
                and src.exists()):
            backup = Path(run_dir) / "best_preresume"
            if not backup.exists():
                shutil.copytree(src, backup)
                log.info("Backed up pre-resume checkpoint to %s", backup)

    t_start = time.time()

    def validate(state, point: str, epoch: int):
        nonlocal best_val_score, no_improvement, eval_rng
        eval_rng, sub = jax.random.split(eval_rng)
        val_metrics, val_samples = evaluate_model(
            eval_step, state.variables(), val_loader, sub, max_samples=4,
            device_data=device_val,
            stager=stager if device_val is None else None)
        val_score = val_metrics.get("dice", 0.0)
        lr = get_learning_rate(state)
        new_lr = scheduler.step(val_score, lr)
        if new_lr != lr:
            log.info("Reducing lr %g -> %g", lr, new_lr)
            state = set_learning_rate(state, new_lr)
        tracker.log({**{f"val/{k}": v for k, v in val_metrics.items()},
                     "learning_rate": new_lr, "epoch": epoch,
                     "step": global_step})
        for i, (img, probs, mask, img_id) in enumerate(val_samples):
            vis = img
            vis = (vis - vis.min()) / (vis.max() - vis.min() + 1e-8)
            tracker.log_image(
                f"step_{global_step}_sample_{i}", vis,
                masks={"predictions": (probs[..., 0] > 0.5).astype(np.uint8),
                       "ground_truth": (mask[..., 0] > 0.5).astype(np.uint8)})
        improved = val_score > best_val_score
        if improved:
            best_val_score = val_score
            no_improvement = 0
            if config.save_checkpoint:
                host_state = {
                    "epoch": epoch, "global_step": global_step,
                    "best_val_score": best_val_score,
                    "scheduler": scheduler.state_dict(),
                    "no_improvement": no_improvement,
                }
                save_checkpoint(run_dir, state, config,
                                host_state=host_state, name="best")
                if config.save_all_improvements:
                    ts = time.strftime("%Y%m%d_%H%M")
                    save_checkpoint(
                        run_dir, state, config, host_state=host_state,
                        name=f"model_{ts}_ep{epoch}_dice{val_score:.4f}")
                log.info("New best model (dice %.4f) saved to %s",
                         val_score, run_dir)
        else:
            no_improvement += 1
        return state, no_improvement >= config.early_stopping_patience

    def _epoch_loop():
        nonlocal state, global_step
        for epoch in range(start_epoch, config.epochs + 1):
            beta = annealer.get_weight(epoch)
            # one device scalar per epoch, not per step (ADVICE r3: the
            # per-step jnp.float32(beta) was an unmanaged ~100 B H2D transfer
            # on the tunneled backend — same leak class the stager bounds)
            beta_dev = jnp.float32(beta)
            log.info("Epoch %d: KL weight (beta) %.6f", epoch, beta)
            epoch_mu, epoch_logvar = [], []
            steps_per_epoch = len(train_loader)
            pending: List[Tuple[Dict, int, int]] = []  # (aux, step, batch_idx)
            # aux stays on device until a validation point; each host fetch is a
            # ~30ms round-trip AND a full pipeline sync on the tunneled backend,
            # so per-step float() reads would serialize every dispatch.

            def flush_pending():
                nonlocal pending
                if not pending:
                    return
                stacked = jax.tree.map(lambda *v: jnp.stack(v),
                                       *[p[0] for p in pending])
                fetched = jax.device_get(stacked)  # one sync for the whole span
                for j, (_, step_no, bidx) in enumerate(pending):
                    if bidx % 5 == 0 and is_vae:
                        epoch_mu.append(fetched["mu"][j])
                        epoch_logvar.append(fetched["logvar"][j])
                    tracker.log({
                        "train/total_loss": float(fetched["loss"][j]),
                        "train/kl_loss": float(fetched["kl_loss"][j]),
                        "train/kl_weight": beta,
                        "train/reconstruction_loss": float(fetched["recon_loss"][j]),
                        "step": step_no, "epoch": epoch,
                    }, step=step_no)
                pending = []

            for batch_idx, batch in enumerate(train_loader):
                if device_train is not None:
                    new_state, aux = train_step(
                        state, device_train.images, device_train.masks,
                        jnp.asarray(device_train.batch_indices(batch["idx"])),
                        beta_dev)
                else:
                    if stager is not None:
                        images, masks = stager.stage(batch["image"],
                                                     batch["mask"])
                    else:
                        images = jnp.asarray(batch["image"])
                        masks = jnp.asarray(batch["mask"])
                    if place_batch is not None:
                        images, masks = place_batch(images, masks)
                    new_state, aux = train_step(state, images, masks,
                                                beta_dev)
                state = new_state
                global_step += 1
                pending.append((aux, global_step, batch_idx))

                current = batch_idx + 1
                if current == steps_per_epoch // 2 or current == steps_per_epoch:
                    flush_pending()
                    point = "mid" if current == steps_per_epoch // 2 else "end"
                    log.info("Running %s-epoch validation (epoch %d, step %d/%d)",
                             point, epoch, current, steps_per_epoch)
                    state, stop = validate(state, point, epoch)
                    if stop:
                        log.info("Early stopping triggered after %d epochs", epoch)
                        tracker.finish(early_stopped=True, final_epoch=epoch)
                        from vaeunet_tpu.training.checkpoint import wait_for_saves
                        wait_for_saves()
                        return state

            flush_pending()
            if epoch_mu:
                stats = calculate_latent_stats(
                    jnp.asarray(np.concatenate(epoch_mu)),
                    jnp.asarray(np.concatenate(epoch_logvar)))
                stats = {k: float(v) for k, v in stats.items()}
                tracker.log({f"latent/{k}": v for k, v in stats.items()
                             if k != "total_dims"} | {"epoch": epoch})
                log.info("Latent stats: active %d/%d (%.2f), total KL %.4f",
                         int(stats["active_dims"]), int(stats["total_dims"]),
                         stats["activity_ratio"], stats["total_kl"])

        log.info("Training done in %.1fs (best dice %.4f)",
                 time.time() - t_start, best_val_score)
        tracker.finish()
        from vaeunet_tpu.training.checkpoint import wait_for_saves
        wait_for_saves()
        return state

    try:
        return _epoch_loop()
    finally:
        if stager is not None:
            stager.close()  # idempotent; frees the staged H2D rings
