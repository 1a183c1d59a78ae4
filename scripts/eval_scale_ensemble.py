#!/usr/bin/env python
"""Cross-scale ensemble evaluation: combine per-image mean probability maps
from checkpoints trained at different scales and sweep the mixing weight.

Motivation (RESULTS.md round 2): the scale-0.5 model wins on small
scattered lesions (IDRiD_80), the scale-1.0 model on confluent plaques
(IDRiD_81) — the reference's ImageNet prior covers both with one model.
A multi-scale ensemble is the TPU-native substitute: each member is an
independent N-sample tempered ensemble (inference.segmentation_distribution),
probability maps are fused at native resolution.

Usage:
  python scripts/eval_scale_ensemble.py \
      --ckpt-a checkpoints/r2b/EX_... --scale-a 0.5 \
      --ckpt-b checkpoints/r2c/EX_... --scale-b 1.0 \
      --lesion-type EX --data-dir /root/reference/data
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-a", required=True)
    p.add_argument("--scale-a", type=float, default=0.5)
    p.add_argument("--ckpt-b", required=True)
    p.add_argument("--scale-b", type=float, default=1.0)
    p.add_argument("--lesion-type", default="EX")
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fusion", choices=["max", "mean"], default="max")
    p.add_argument("--output-dir", default=None,
                   help="If set, write the reference-schema analysis_metrics.csv "
                        "for the fused predictor under "
                        "<output-dir>/<LESION>_T<T>_N<N>/ (uncertainty = "
                        "pooled member samples resized to native resolution)")
    args = p.parse_args()

    from vaeunet_tpu.compat.loading import load_model_and_variables
    from vaeunet_tpu.data.dataset import IDRIDDataset
    from vaeunet_tpu.inference.predict import segmentation_distribution
    from vaeunet_tpu.ops.resize import resize_bilinear

    model_a, vars_a, _ = load_model_and_variables(args.ckpt_a)
    model_b, vars_b, _ = load_model_and_variables(args.ckpt_b)

    ds_a = IDRIDDataset(args.data_dir, split="test", scale=args.scale_a,
                        patch_size=None, lesion_type=args.lesion_type,
                        skip_border_check=True)
    ds_b = IDRIDDataset(args.data_dir, split="test", scale=args.scale_b,
                        patch_size=None, lesion_type=args.lesion_type,
                        skip_border_check=True)

    from vaeunet_tpu.uncertainty import (
        calculate_expected_calibration_error,
        calculate_sparsification_metrics,
        calculate_uncertainty_error_auc,
        calculate_uncertainty_error_dice,
    )

    rng = jax.random.PRNGKey(args.seed)
    weights = np.linspace(0.0, 1.0, 11)
    dice_tbl = {}     # img -> [dice(w) for w in weights]
    max_tbl = {}      # img -> dice of pixelwise-max fusion
    csv_rows = []

    for img_id in ds_b.unique_image_ids():
        img_a, _ = ds_a.get_image_and_mask(img_id)
        img_b, mask_b = ds_b.get_image_and_mask(img_id)
        gt = np.asarray(mask_b)[..., 0]

        rng, sa, sb = jax.random.split(rng, 3)
        samples_a, _, _ = segmentation_distribution(
            model_a, vars_a, jnp.asarray(img_a), sa,
            num_samples=args.samples, temperature=args.temperature,
            patch_size=args.patch_size)
        samples_b, _, _ = segmentation_distribution(
            model_b, vars_b, jnp.asarray(img_b), sb,
            num_samples=args.samples, temperature=args.temperature,
            patch_size=args.patch_size)

        mean_a = jnp.mean(samples_a, axis=0)               # [h/2, w/2, 1]
        mean_a_up = resize_bilinear(mean_a, gt.shape[:2], align_corners=False)
        pa = np.asarray(mean_a_up)[..., 0]
        pb = np.asarray(jnp.mean(samples_b, axis=0))[..., 0]

        def dice_of(prob):
            pred = (prob > 0.5).astype(np.float32)
            return float(2 * (pred * gt).sum() / (pred.sum() + gt.sum() + 1e-8))

        dice_tbl[img_id] = [dice_of(w * pb + (1 - w) * pa) for w in weights]
        max_tbl[img_id] = dice_of(np.maximum(pa, pb))
        print(f"{img_id}: a(0.5)={dice_tbl[img_id][0]:.3f} "
              f"b(1.0)={dice_tbl[img_id][-1]:.3f} "
              f"mix0.5={dice_tbl[img_id][5]:.3f} max={max_tbl[img_id]:.3f}",
              flush=True)

        if args.output_dir:
            # Fused predictor metrics in the reference analyze_model.py
            # 7-column schema.  Probability map = the fused map; per-pixel
            # uncertainty = std over ALL member samples at native res.
            fused = (np.maximum(pa, pb) if args.fusion == "max"
                     else 0.5 * (pa + pb))
            up_a = resize_bilinear(
                jnp.asarray(samples_a), gt.shape[:2], align_corners=False)
            pooled = np.concatenate(
                [np.asarray(up_a)[..., 0], np.asarray(samples_b)[..., 0]])
            std_dev = pooled.std(axis=0)
            pred_binary = (fused > 0.5).astype(np.float32)
            dice = dice_of(fused)
            ece, *_ = calculate_expected_calibration_error(fused, gt)
            ue_dice = calculate_uncertainty_error_dice(std_dev, pred_binary, gt)
            frac, err_r, err_u = calculate_sparsification_metrics(
                fused[None], std_dev[None], gt[None], num_points=20)
            if err_r[0] > 0:
                norm_r, norm_u = err_r / err_r[0], err_u / err_r[0]
            else:
                norm_r, norm_u = err_r, err_u
            se = float(np.trapezoid(norm_r - norm_u, frac))
            auroc, auprc = calculate_uncertainty_error_auc(fused, gt, std_dev)
            csv_rows.append({
                "img_id": str(img_id), "dice": dice, "ece": ece,
                "sparsification_error": se, "uncertainty_error_dice": ue_dice,
                "error_auroc": auroc, "error_auprc": auprc,
            })

    print("\nw_b  " + "  ".join(f"{w:.1f}" for w in weights))
    for img_id, row in dice_tbl.items():
        print(f"{img_id}: " + "  ".join(f"{d:.3f}" for d in row))
    means = np.mean(np.array(list(dice_tbl.values())), axis=0)
    print("mean: " + "  ".join(f"{d:.3f}" for d in means))
    print(f"best mixed mean dice: {means.max():.4f} at w_b={weights[means.argmax()]:.1f}")
    print(f"max-fusion mean dice: {np.mean(list(max_tbl.values())):.4f}")

    if args.output_dir:
        import pandas as pd
        out = (Path(args.output_dir)
               / f"{args.lesion_type}_T{args.temperature}_N{args.samples}")
        out.mkdir(parents=True, exist_ok=True)
        df = pd.DataFrame(csv_rows)
        df.to_csv(out / "analysis_metrics.csv", index=False)
        print(f"wrote {out / 'analysis_metrics.csv'} "
              f"(fusion={args.fusion}, mean dice {df['dice'].mean():.4f})")


if __name__ == "__main__":
    main()
