#!/usr/bin/env python
"""Train a member pool for one lesion family and stage the parameter-free
ensemble protocol: mean fusion over every member (+ h-flip TTA) with the
per-image expected-area threshold at w_a=1.0.

ONE process end-to-end for the TPU stages (wedge discipline,
.claude/skills/verify/SKILL.md); the numpy-heavy protocol apply runs as a
separate CPU process after this one exits:

  python scripts/family_drive.py --lesion-type SE --split val \\
      --member a05:scale=0.5,epochs=60 \\
      --member p25:scale=0.25,epochs=60,oversample=20

Member spec grammar: LABEL:key=value[,key=value...] with keys
  scale (required), seed (42), epochs (60), oversample (0), loss (default).

Shared plumbing (probe/train/maps/deadline) lives in scripts/drive_common.py;
the EX bootstrap preset is scripts/r4_bootstrap_ex.py.

Stages are marker-file guarded so an interrupted drive resumes.
"""

import argparse
import json
import logging
import sys

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.drive_common import (  # noqa: E402
    best_val_score, compute_maps, probe_tpu, train_member)


def parse_member(spec: str):
    label, rest = spec.split(":", 1)
    kw = dict(seed=42, epochs=60)
    for item in rest.split(","):
        k, v = item.split("=", 1)
        if k == "scale":
            kw["img_scale"] = float(v)
        elif k == "seed":
            kw["seed"] = int(v)
        elif k == "epochs":
            kw["epochs"] = int(v)
        elif k == "oversample":
            kw["oversample_lesion"] = float(v)
        elif k == "loss":
            kw["loss"] = v
        elif k == "ds":
            kw["deep_supervision"] = v not in ("0", "false", "False")
        elif k == "lr":
            kw["learning_rate"] = float(v)
        elif k == "klleak":
            kw["kl_clamp_leak"] = float(v)
        elif k == "patience":
            # counted per VALIDATION (2/epoch) like the reference's loop
            kw["early_stopping_patience"] = int(v)
        elif k == "bs":
            kw["batch_size"] = int(v)
        else:
            raise ValueError(f"unknown member key {k!r} in {spec!r}")
    if "img_scale" not in kw:
        raise ValueError(f"member {spec!r} needs scale=")
    return label, kw


def train_members(args, members) -> dict:
    runs = {}
    for label, kw in members:
        runs[label] = train_member(
            label, kw, tag=args.tag, lesion_type=args.lesion_type,
            data_dir=args.data_dir, patch_size=args.patch_size,
            batch_size=args.batch_size, grad_accum=args.grad_accum)
    return runs


def stage_maps(args, members, runs, maps_dir: Path, pool: list) -> None:
    scales = dict((label, kw["img_scale"]) for label, kw in members)
    specs = []
    for label in pool:
        scale = scales[label]
        specs += [f"{label}={runs[label]}@{scale}",
                  f"{label}F={runs[label]}@{scale}:h"]
    compute_maps(specs, args.split, maps_dir, args.lesion_type,
                 data_dir=args.data_dir, samples=args.samples,
                 patch_size=args.patch_size)


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--lesion-type", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--member", action="append", required=True,
                   help="LABEL:scale=S[,seed=N,epochs=E,oversample=K,loss=L]")
    p.add_argument("--tag", default=None,
                   help="checkpoint dir prefix (default r3<family>)")
    p.add_argument("--data-dir", default="/root/reference/data")
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--grad-accum", type=int, default=2)
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--val-floor", type=float, default=0.5,
                   help="pre-registered pool rule: a member joins the "
                        "protocol pool iff its best VALIDATION dice passes "
                        "this floor (never test-based selection)")
    args = p.parse_args()
    if args.tag is None:
        args.tag = f"r3{args.lesion_type.lower()}"

    members = [parse_member(s) for s in args.member]
    maps_dir = REPO / ".maps" / f"{args.tag}_{args.split}"

    probe_tpu()
    runs = train_members(args, members)
    vals = {label: best_val_score(run) for label, run in runs.items()}
    pool = sorted(l for l, v in vals.items() if v >= args.val_floor)
    for label in sorted(vals):
        tag = ("pool" if label in pool
               else f"EXCLUDED (val floor {args.val_floor})")
        print(f"[{label}] best val dice {vals[label]:.4f} -> {tag}",
              flush=True)
    stage_maps(args, members, runs, maps_dir, pool)

    point = {
        "members": sorted(pool + [f"{l}F" for l in pool]),
        "member_val_dice": {l: round(vals[l], 4) for l in sorted(vals)},
        "val_floor": args.val_floor,
        "fusion": "mean", "weight": 1.0,
        "threshold_mode": "area", "threshold": 1.0,
        "objective": ("none (parameter-free protocol: all members, mean "
                      "fusion, expected-area threshold at w_a=1.0)"),
    }
    maps_dir.mkdir(parents=True, exist_ok=True)
    (maps_dir / "point.json").write_text(json.dumps(point, indent=2))
    print("drive complete; apply the protocol in a separate CPU process:",
          flush=True)
    print(f"  python scripts/tune_fusion.py --val-dir {maps_dir} "
          f"--test-dir {maps_dir} "
          f"--output-dir results/{args.tag}_protocol_free "
          f"--point-json {maps_dir / 'point.json'}", flush=True)


if __name__ == "__main__":
    main()
