"""Per-image uncertainty analysis pipeline.

Rebuild of reference ``analyze_model.py:694-1228`` (analyze_model): for each
unique test image, draw N tempered latent samples, predict (tiled or full),
compute per-image uncertainty metrics, spill per-pixel arrays, then run the
global aggregation stage (calibration, temperature scaling, sparsification,
uncertainty distributions, ROC/PR) and write ``analysis_metrics.csv`` with
the reference's 7-column schema (img_id, dice, ece, sparsification_error,
uncertainty_error_dice, error_auroc, error_auprc).  ``extended_metrics``
adds the older analyzer's superset columns (brier, nll, mean_entropy,
mean_mutual_info, mean_coeff_variation, uncertain_pixel_percent — cf.
uncertainty/MA_T1.0_N5/analysis_metrics.csv:1).

TPU-native differences (values unchanged):
- the N-sample ensemble shares one encoder pass and vmaps the decoder
  (vaeunet_tpu.inference), instead of N full re-encodes;
- attention maps come from flax ``sow`` intermediates (one deterministic
  z=mu pass), not forward hooks.
"""

from __future__ import annotations

import logging
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vaeunet_tpu.analysis import plots as gplots
from vaeunet_tpu.inference.predict import segmentation_distribution, uncertainty_maps
from vaeunet_tpu.models.vae_unet import UNetResNet, resolve_injection
from vaeunet_tpu.uncertainty import (calculate_expected_calibration_error,
                                     calculate_negative_log_likelihood,
                                     calculate_segmentation_metrics_chunked,
                                     calculate_sparsification_metrics,
                                     calculate_uncertainty_error_auc,
                                     calculate_uncertainty_error_dice,
                                     brier_score)
from vaeunet_tpu.utils.tensor_utils import ensure_dict_python_scalars

log = logging.getLogger(__name__)


@dataclass
class AnalyzeArgs:
    """Mirrors the reference CLI (analyze_model.py:1230-1269)."""
    lesion_type: str = "EX"
    temperature: float = 1.0
    samples: int = 10
    patch_size: Optional[int] = None
    overlap: Optional[int] = 100
    output_dir: str = "./analysis_results"
    max_images: Optional[int] = None
    temp_values: Sequence[float] = (0.5, 1.0, 1.5, 2.0, 2.5, 3.0)
    model_label: str = "VAE-UNet"
    batch_size: int = 4
    extended_metrics: bool = False
    keep_temp_data: bool = False
    seed: int = 0
    # Decision rule (framework extension; the reference always uses a
    # global 0.5 — analyze_model.py:884-886).  "area" picks a per-image
    # threshold from the map's soft mass (inference.expected_area_threshold).
    threshold_mode: str = "fixed"
    area_factor: float = 1.0
    # The replication grid (scripts/replication_grid.py) runs 13 configs in
    # one process; the global plot/aggregation stage is host-CPU-heavy and
    # identical across configs of the same model, so it can be skipped.
    global_plots: bool = True


def analyze_model(model: UNetResNet, variables, dataset, args: AnalyzeArgs,
                  tracker=None):
    """-> pandas DataFrame of per-image metrics (+ CSV and plots on disk)."""
    import pandas as pd

    out_dir = Path(args.output_dir) / (
        f"{args.lesion_type}_T{args.temperature}_N{args.samples}")
    out_dir.mkdir(parents=True, exist_ok=True)
    temp_dir = out_dir / "temp_pixel_data"
    temp_dir.mkdir(parents=True, exist_ok=True)

    _, _, should_sample = resolve_injection(model.latent_injection)
    if not should_sample:
        log.info("Latent injection '%s': deterministic mu (temperature ignored)",
                 model.latent_injection)

    rng = jax.random.PRNGKey(args.seed)
    metrics_data: List[dict] = []
    processed_ids: List[str] = []

    for img_id in dataset.unique_image_ids():
        if args.max_images and len(processed_ids) >= args.max_images:
            break
        log.info("Processing image %s", img_id)
        try:
            img, mask = dataset.get_image_and_mask(img_id)
            img_j = jnp.asarray(img)
            rng, sub = jax.random.split(rng)
            temperature = args.temperature if should_sample else 0.0
            samples, mu, logvar = segmentation_distribution(
                model, variables, img_j, sub, num_samples=args.samples,
                temperature=temperature, patch_size=args.patch_size,
                tile_batch=args.batch_size, overlap=args.overlap)
            samples_np = np.asarray(samples)[..., 0]          # [N,H,W]
            gt = np.asarray(mask)[..., 0]                     # [H,W]

            mean_pred = samples_np.mean(axis=0)
            std_dev = samples_np.std(axis=0)
            if args.threshold_mode == "area":
                from vaeunet_tpu.inference.ensemble import expected_area_threshold
                thr = expected_area_threshold(mean_pred, args.area_factor)
                log.info("%s: expected-area threshold %.3f", img_id, thr)
            else:
                thr = 0.5
            pred_binary = (mean_pred > thr).astype(np.float32)

            # --- per-image metrics (analyze_model.py:884-953) ---
            gt_round = np.round(gt).astype(int)
            ue_dice = calculate_uncertainty_error_dice(std_dev, pred_binary, gt)
            ece, *_ = calculate_expected_calibration_error(mean_pred, gt)
            dice = float((2.0 * (pred_binary * gt).sum())
                         / (pred_binary.sum() + gt.sum() + 1e-8))

            np.save(temp_dir / f"{img_id}_pred_flat.npy",
                    mean_pred.reshape(-1).astype(np.float32))
            np.save(temp_dir / f"{img_id}_gt_flat.npy", gt_round.reshape(-1))

            frac, err_r, err_u = calculate_sparsification_metrics(
                mean_pred[None], std_dev[None], gt[None], num_points=20)
            if err_r[0] > 0:
                norm_r, norm_u = err_r / err_r[0], err_u / err_r[0]
            else:
                norm_r, norm_u = err_r, err_u
            se = float(np.trapezoid(norm_r - norm_u, frac))
            np.savez(temp_dir / f"{img_id}_sparsification.npz",
                     frac_removed=frac, err_random=err_r, err_uncertainty=err_u)

            correct = pred_binary == gt
            np.savez(temp_dir / f"{img_id}_uncertainty_dist.npz",
                     uncertainties_correct=std_dev[correct],
                     uncertainties_incorrect=std_dev[~correct])
            errors = (pred_binary != gt).astype(np.int32).reshape(-1)
            np.save(temp_dir / f"{img_id}_errors.npy", errors)
            np.save(temp_dir / f"{img_id}_uncertainties.npy",
                    std_dev.reshape(-1).astype(np.float32))

            auroc, auprc = calculate_uncertainty_error_auc(mean_pred, gt, std_dev)

            row = {
                "img_id": str(img_id),
                "dice": dice,
                "ece": ece,
                "sparsification_error": se,
                "uncertainty_error_dice": ue_dice,
                "error_auroc": auroc,
                "error_auprc": auprc,
            }
            if args.extended_metrics:
                maps = uncertainty_maps(jnp.asarray(samples_np[..., None]))
                row.update({
                    "brier": brier_score(mean_pred, gt),
                    "nll": calculate_negative_log_likelihood(mean_pred, gt),
                    "mean_entropy": float(np.asarray(maps["entropy"]).mean()),
                    "mean_mutual_info": float(np.asarray(maps["mutual_info"]).mean()),
                    "mean_coeff_variation": float(np.asarray(maps["cv"]).mean()),
                    "uncertain_pixel_percent": float((std_dev > 0.2).mean() * 100),
                })
            metrics_data.append(ensure_dict_python_scalars(row))
            processed_ids.append(img_id)

            if tracker is not None:
                _log_image_panel(tracker, img_id, img, gt, mean_pred, std_dev)
                _log_attention_maps(tracker, model, variables, img_j, mu,
                                    img_id, args)
        except Exception as e:
            log.error("Error processing image %s: %s", img_id, e, exc_info=True)
            for suffix in ("_pred_flat.npy", "_gt_flat.npy", "_errors.npy",
                           "_uncertainties.npy", "_sparsification.npz",
                           "_uncertainty_dist.npz"):
                (temp_dir / f"{img_id}{suffix}").unlink(missing_ok=True)
            continue

    metrics_df = pd.DataFrame(metrics_data)
    for col in metrics_df.columns:
        if col != "img_id":
            metrics_df[col] = pd.to_numeric(metrics_df[col], errors="coerce")
    csv_path = out_dir / "analysis_metrics.csv"
    metrics_df.to_csv(csv_path, index=False)
    log.info("Saved metrics data to %s", csv_path)

    # --- global aggregation stage (analyze_model.py:1069-1208) ---
    if not args.global_plots:
        if len(metrics_df):
            log.info("Analyzed %d images | Dice %.4f | errAUROC %.4f "
                     "(global plot stage skipped)", len(metrics_df),
                     metrics_df["dice"].mean(),
                     metrics_df["error_auroc"].mean())
        if not args.keep_temp_data:
            shutil.rmtree(temp_dir, ignore_errors=True)
        return metrics_df
    gplots.plot_segmentation_roc_pr(processed_ids, temp_dir, out_dir,
                                    model_label=args.model_label, tracker=tracker)
    seg_metrics = calculate_segmentation_metrics_chunked(
        processed_ids, temp_dir, threshold=0.5, chunk_size=100000)
    log.info("[Segmentation Metrics - Global] %s",
             {k: round(v, 4) for k, v in seg_metrics.items()})
    gplots.create_calibration_visualizations(processed_ids, temp_dir, out_dir,
                                             tracker=tracker)
    gplots.perform_temperature_analysis(processed_ids, temp_dir, out_dir,
                                        args.temp_values, tracker=tracker)
    gplots.plot_global_sparsification_curve(processed_ids, temp_dir, out_dir,
                                            model_label=args.model_label,
                                            tracker=tracker)
    gplots.plot_global_uncertainty_distribution(processed_ids, temp_dir,
                                                out_dir,
                                                model_label=args.model_label,
                                                tracker=tracker)
    gplots.plot_global_roc_pr(processed_ids, temp_dir, out_dir,
                              model_label=args.model_label, tracker=tracker)
    gplots.create_uncertainty_visualizations(metrics_df, out_dir,
                                             tracker=tracker)

    if tracker is not None and len(metrics_df):
        tracker.summary({
            "summary/avg_dice": float(metrics_df["dice"].mean()),
            "summary/avg_ece": float(metrics_df["ece"].mean()),
            "summary/avg_sparsification_error":
                float(metrics_df["sparsification_error"].mean()),
            "summary/avg_uncertainty_error_dice":
                float(metrics_df["uncertainty_error_dice"].mean()),
            "summary/avg_error_auroc": float(metrics_df["error_auroc"].mean()),
            "summary/avg_error_auprc": float(metrics_df["error_auprc"].mean()),
            **{f"segmentation/{k}": v for k, v in seg_metrics.items()},
        })

    if len(metrics_df):
        log.info("Analyzed %d images | Dice %.4f+-%.4f | ECE %.4f+-%.4f | "
                 "SE %.4f | UE-Dice %.4f | errAUROC %.4f | errAUPRC %.4f",
                 len(metrics_df), metrics_df["dice"].mean(),
                 metrics_df["dice"].std(), metrics_df["ece"].mean(),
                 metrics_df["ece"].std(),
                 metrics_df["sparsification_error"].mean(),
                 metrics_df["uncertainty_error_dice"].mean(),
                 metrics_df["error_auroc"].mean(),
                 metrics_df["error_auprc"].mean())

    if not args.keep_temp_data:
        shutil.rmtree(temp_dir, ignore_errors=True)
    return metrics_df


def _log_image_panel(tracker, img_id, img, gt, mean_pred, std_dev):
    """Original / GT / mean-pred / colored-uncertainty images.
    (analyze_model.py:961-1010)"""
    try:
        import matplotlib.cm as cm
        img_vis = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        gt_vis = (gt * 255).clip(0, 255).astype(np.uint8)
        pr = (mean_pred - mean_pred.min()) / (mean_pred.max() - mean_pred.min() + 1e-8)
        pred_vis = (pr * 255).astype(np.uint8)
        un = (std_dev - std_dev.min()) / (std_dev.max() - std_dev.min() + 1e-8)
        unc_vis = (cm.get_cmap("hot")(un)[:, :, :3] * 255).astype(np.uint8)
        tracker.log_image(f"visualizations/{img_id}/original_image", img_vis)
        tracker.log_image(f"visualizations/{img_id}/ground_truth", gt_vis)
        tracker.log_image(f"visualizations/{img_id}/mean_prediction", pred_vis)
        tracker.log_image(f"visualizations/{img_id}/uncertainty_map_std_dev",
                          unc_vis)
    except Exception as e:
        log.warning("Could not log visualizations for %s: %s", img_id, e)


import functools


@functools.partial(jax.jit, static_argnums=(0,))
def _forward_with_intermediates(model, variables, x):
    return model.apply(variables, x, train=False, sample=False,
                       mutable=["intermediates"])


def _log_attention_maps(tracker, model, variables, img_j, mu, img_id, args):
    """Attention-gate psi maps via flax intermediates (full-image mode only,
    like the reference's hook path — analyze_model.py:713-715,801-880)."""
    if args.patch_size is not None or not getattr(model, "use_attention", False):
        return
    try:
        _, state = _forward_with_intermediates(model, variables, img_j[None])
        inter = state.get("intermediates", {})
        flat = jax.tree_util.tree_flatten_with_path(inter)[0]
        import matplotlib.cm as cm
        for path, value in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if "psi" not in name:
                continue
            amap = np.asarray(value)[0, ..., 0] if np.asarray(value).ndim == 4 \
                else np.asarray(value).reshape(np.asarray(value).shape[-3:-1])
            amap = (amap - amap.min()) / (amap.max() - amap.min() + 1e-8)
            vis = (cm.get_cmap("viridis")(amap)[:, :, :3] * 255).astype(np.uint8)
            tracker.log_image(
                f"attention/{img_id}/{name.replace('/', '_')}", vis)
    except Exception as e:
        log.warning("Could not capture attention maps for %s: %s", img_id, e)
