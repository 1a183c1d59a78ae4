#!/usr/bin/env python
"""Compute cached per-member probability maps for ensemble fusion/tuning.

For each (member, image) this saves under --outdir:
  <label>_<img>.npy       float32 [H, W]   mean probability over N samples
  <label>_<img>_mom.npy   float32 [2,H,W]  sample sum and sum-of-squares
  gt_<img>.npy            uint8  [H, W]    ground truth at scale 1.0

These are the inputs of scripts/tune_fusion.py (operating-point tuning and
the parameter-free protocol apply).  A framework extension — the reference
has no ensemble machinery (its analyze_model.py:945-953 evaluates one
model at threshold 0.5).

Members are given as repeatable --member flags:
  --member b05=checkpoints/r2b/EX_...@0.5
  --member f10F=checkpoints/r2f/EX_...@1.0:h     (h-flip TTA)
  --member g05V=checkpoints/r2g/EX_...@0.5:v     (v-flip TTA)

Existing output files are skipped, so interrupted runs resume.  Maps are
computed at the member's scale and bilinearly resized (align_corners=False,
the data-pipeline convention) to the scale-1.0 ground-truth size.
"""
import argparse
import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_member(spec: str):
    """label=checkpoint@scale[:h|:v][:cK] — flip TTA and, for multi-task
    (lesion_type='ALL') checkpoints, the output channel to read."""
    label, rest = spec.split("=", 1)
    parts = rest.split(":")
    rest, flip, channel = parts[0], None, 0
    for tok in parts[1:]:
        if tok in ("h", "v"):
            flip = tok
        elif tok.startswith("c") and tok[1:].isdigit():
            channel = int(tok[1:])
        else:
            raise ValueError(f"unknown member flag {tok!r} in {spec!r}")
    ckpt, scale = rest.rsplit("@", 1)
    return label, ckpt, float(scale), flip, channel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--member", action="append", required=True,
                   help="label=checkpoint@scale[:h|:v]")
    p.add_argument("--lesion-type", required=True)
    p.add_argument("--split", default="test", choices=["train", "val", "test"])
    p.add_argument("--outdir", required=True)
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--images", action="append", default=None,
                   help="Restrict to these image ids (repeatable); default "
                        "all images in the split")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaeunet_tpu.compat.loading import load_model_and_variables
    from vaeunet_tpu.data.dataset import IDRIDDataset
    from vaeunet_tpu.inference.predict import segmentation_distribution
    from vaeunet_tpu.ops.resize import resize_bilinear

    members = [parse_member(s) for s in args.member]
    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    for stale in out.glob(".tmp.*.npy"):  # killed mid-rename
        stale.unlink()

    ds_by_scale = {}
    for _, _, scale, _, _ in members:
        ds_by_scale.setdefault(scale, IDRIDDataset(
            args.data_dir, split=args.split, scale=scale, patch_size=None,
            lesion_type=args.lesion_type, skip_border_check=True))
    ds_by_scale.setdefault(1.0, IDRIDDataset(
        args.data_dir, split=args.split, scale=1.0, patch_size=None,
        lesion_type=args.lesion_type, skip_border_check=True))
    gt_ds = ds_by_scale[1.0]

    model_cache = {}

    def load(ckpt):
        if ckpt not in model_cache:
            model_cache[ckpt] = load_model_and_variables(ckpt)[:2]
        return model_cache[ckpt]

    rng = jax.random.PRNGKey(args.seed)
    img_ids = gt_ds.unique_image_ids()
    if args.images:
        img_ids = [i for i in img_ids if i in set(args.images)]
    for img_id in img_ids:
        gt_path = out / f"gt_{img_id}.npy"
        if not gt_path.exists():
            _, mask = gt_ds.get_image_and_mask(img_id)
            np.save(gt_path, np.asarray(mask)[..., 0].astype(np.uint8))
        gt_shape = tuple(np.load(gt_path, mmap_mode="r").shape[:2])
        for label, ckpt, scale, flip, channel in members:
            if (out / f"{label}_{img_id}.npy").exists():
                continue
            model, variables = load(ckpt)
            img, _ = ds_by_scale[scale].get_image_and_mask(img_id)
            img = jnp.asarray(img)
            if flip == "h":
                img = img[:, ::-1]
            elif flip == "v":
                img = img[::-1]
            rng, sub = jax.random.split(rng)
            samples, _, _ = segmentation_distribution(
                model, variables, img, sub, num_samples=args.samples,
                temperature=args.temperature, patch_size=args.patch_size)
            if flip == "h":
                samples = samples[:, :, ::-1]
            elif flip == "v":
                samples = samples[:, ::-1]
            if tuple(samples.shape[1:3]) != gt_shape:
                samples = resize_bilinear(samples, gt_shape,
                                          align_corners=False)
            s = np.asarray(samples)[..., channel]
            # mom first, map last via rename: the map file is the skip key,
            # so its presence must imply both files are complete (a kill
            # mid-np.save must not leave a truncated map that resumes trust)
            np.save(out / f"{label}_{img_id}_mom.npy",
                    np.stack([s.sum(0), (s ** 2).sum(0)]).astype(np.float32))
            tmp = out / f".tmp.{label}.{img_id}.npy"
            np.save(tmp, s.mean(0).astype(np.float32))
            tmp.replace(out / f"{label}_{img_id}.npy")
            del samples, s
            print(f"map {out} {label} {img_id} done", flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
