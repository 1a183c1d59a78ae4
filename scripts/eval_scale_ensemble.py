#!/usr/bin/env python
"""Cross-scale ensemble evaluation: fuse per-image mean probability maps
from N checkpoints (typically trained at different scales).

Motivation (RESULTS.md round 2): the scale-0.5 model wins on small
scattered lesions (IDRiD_80), the scale-1.0 model on confluent plaques
(IDRiD_81) — the reference's ImageNet prior covers both with one model.
A multi-scale ensemble is the TPU-native substitute: each member is an
independent N-sample tempered ensemble (inference.segmentation_distribution),
probability maps are fused at native resolution (max or mean).

For exactly two members, a linear mixing-weight sweep is also printed.

Usage:
  python scripts/eval_scale_ensemble.py \
      --member checkpoints/r2b/EX_...@0.5 \
      --member checkpoints/r2c/EX_...@1.0 \
      --lesion-type EX --data-dir /root/reference/data \
      --output-dir results/r2_ensemble_analysis
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def parse_member(spec: str):
    path, _, scale = spec.rpartition("@")
    if not path:
        raise argparse.ArgumentTypeError(
            f"--member must be CKPT_DIR@SCALE, got {spec!r}")
    return path, float(scale)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--member", action="append", type=parse_member,
                   required=True, metavar="CKPT_DIR@SCALE",
                   help="Repeatable; e.g. checkpoints/r2b/EX_...@0.5")
    p.add_argument("--lesion-type", default="EX")
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fusion", choices=["max", "mean", "noisyor"],
                   default="max",
                   help="noisyor: 1 - prod((1-p_m)^w) — a union of "
                        "independent detectors; boosts low-confidence "
                        "small-lesion hits that max-fusion leaves under "
                        "the decision threshold")
    p.add_argument("--fusion-weight", type=float, default=1.0,
                   help="Exponent w for noisyor fusion (>1 sharpens the union)")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Decision threshold on the fused probability map")
    p.add_argument("--split", default="test", choices=["test", "val", "train"],
                   help="Dataset split to evaluate (use val to select "
                        "fusion hyperparameters without touching test)")
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
    from vaeunet_tpu.uncertainty import (
        calculate_expected_calibration_error,
        calculate_sparsification_metrics,
        calculate_uncertainty_error_auc,
        calculate_uncertainty_error_dice,
    )

    members = []        # (model, variables, dataset, scale)
    gt_scale = max(s for _, s in args.member)
    for path, scale in args.member:
        model, variables, _ = load_model_and_variables(path)
        ds = IDRIDDataset(args.data_dir, split=args.split, scale=scale,
                          patch_size=None, lesion_type=args.lesion_type,
                          skip_border_check=True)
        members.append((model, variables, ds, scale))
    gt_ds = next(ds for _, _, ds, s in members if s == gt_scale)

    rng = jax.random.PRNGKey(args.seed)
    weights = np.linspace(0.0, 1.0, 11)
    pair_tbl = {}       # 2-member mixing sweep
    fused_tbl = {}
    csv_rows = []

    for img_id in gt_ds.unique_image_ids():
        _, mask = gt_ds.get_image_and_mask(img_id)
        gt = np.asarray(mask)[..., 0]

        probs, sample_stacks = [], []
        for model, variables, ds, scale in members:
            img, _ = ds.get_image_and_mask(img_id)
            rng, sub = jax.random.split(rng)
            samples, _, _ = segmentation_distribution(
                model, variables, jnp.asarray(img), sub,
                num_samples=args.samples, temperature=args.temperature,
                patch_size=args.patch_size)
            mean = jnp.mean(samples, axis=0)
            if tuple(mean.shape[:2]) != gt.shape[:2]:
                mean = resize_bilinear(mean, gt.shape[:2],
                                       align_corners=False)
                samples = resize_bilinear(samples, gt.shape[:2],
                                          align_corners=False)
            probs.append(np.asarray(mean)[..., 0])
            sample_stacks.append(np.asarray(samples)[..., 0])

        def dice_of(prob):
            pred = (prob > args.threshold).astype(np.float32)
            return float(2 * (pred * gt).sum() / (pred.sum() + gt.sum() + 1e-8))

        # 1-ulp bilinear overshoot can push probs past 1.0; clip before
        # fusion so (1-p)^w stays real (see uncertainty.py sparsification fix)
        stack = np.clip(np.stack(probs), 0.0, 1.0)
        if args.fusion == "max":
            fused = stack.max(axis=0)
        elif args.fusion == "mean":
            fused = stack.mean(axis=0)
        else:
            fused = 1.0 - np.prod((1.0 - stack) ** args.fusion_weight, axis=0)
        fused_tbl[img_id] = dice_of(fused)
        singles = "  ".join(f"m{i}={dice_of(p):.3f}"
                            for i, p in enumerate(probs))
        print(f"{img_id}: {singles}  {args.fusion}-fused={fused_tbl[img_id]:.3f}",
              flush=True)
        if len(members) == 2:
            pa, pb = probs
            pair_tbl[img_id] = [dice_of(w * pb + (1 - w) * pa)
                                for w in weights]

        if args.output_dir:
            # Fused predictor metrics in the reference analyze_model.py
            # 7-column schema.  Probability map = the fused map; per-pixel
            # uncertainty = std over ALL member samples at native res.
            pooled = np.concatenate(sample_stacks)
            std_dev = pooled.std(axis=0)
            pred_binary = (fused > args.threshold).astype(np.float32)
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
                "img_id": str(img_id), "dice": fused_tbl[img_id], "ece": ece,
                "sparsification_error": se, "uncertainty_error_dice": ue_dice,
                "error_auroc": auroc, "error_auprc": auprc,
            })

    if pair_tbl:
        print("\nw_b  " + "  ".join(f"{w:.1f}" for w in weights))
        for img_id, row in pair_tbl.items():
            print(f"{img_id}: " + "  ".join(f"{d:.3f}" for d in row))
        means = np.mean(np.array(list(pair_tbl.values())), axis=0)
        print("mean: " + "  ".join(f"{d:.3f}" for d in means))
        print(f"best mixed mean dice: {means.max():.4f} "
              f"at w_b={weights[means.argmax()]:.1f}")
    print(f"{args.fusion}-fusion mean dice: "
          f"{np.mean(list(fused_tbl.values())):.4f}")

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
