#!/usr/bin/env python
"""Qualify ensemble members for the parameter-free protocol from VAL maps.

The original pool rule used the training loop's best validation dice
(patch-posterior regime).  Drive-5 forensics (RESULTS.md) showed that rule
passes members that are degenerate or miscalibrated in the regime the
protocol actually runs in — whole-image maps with sampled latents:
a member can hold val-patch dice 0.68 while its whole-image maps are
numerically degenerate, and an undertrained member can pass the patch
floor while spraying 20x the lesion area in diffuse soft mass.

Amended rule (still val-only, no test input): a member (and its flip-TTA
variant) joins the pool iff ITS OWN whole-image maps score >= --floor
mean dice on the VAL split under the protocol's decision rule (per-image
expected-area threshold at w_a=1.0).  Same inference regime as the
protocol, same decision rule, measured on val.

  python scripts/pool_rule.py --val-dir .maps/r3_ex_val \
      --out .maps/r3_ex_test/point.json --floor 0.5

Pure numpy — safe beside a live TPU drive.
"""
import argparse
import json
from pathlib import Path

import numpy as np


def area_threshold(p: np.ndarray, w_a: float = 1.0,
                   target_area: float | None = None) -> float:
    """Smallest threshold t where |{p > t}| <= w_a * target_area (returns
    `hi`, matching tune_fusion.area_thresholds' first-bin-edge-below-target
    semantics — the midpoint would over-predict on plateaued maps).
    target_area defaults to the map's own soft mass sum(p)."""
    target = w_a * (p.sum() if target_area is None else target_area)
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if (p > mid).sum() > target:
            lo = mid
        else:
            hi = mid
    return hi


def dice(pred: np.ndarray, gt: np.ndarray) -> float:
    inter = (pred & gt).sum()
    return 2.0 * inter / max(pred.sum() + gt.sum(), 1e-9)


def member_val_dice(val_dir: Path, label: str, imgs) -> float:
    scores = []
    for img in imgs:
        p = np.load(val_dir / f"{label}_{img}.npy")
        gt = np.load(val_dir / f"gt_{img}.npy").astype(bool)
        scores.append(dice(p > area_threshold(p), gt))
    return float(np.mean(scores))


FUSION_RULES = {
    "mean": lambda s: s.mean(0),
    "max": lambda s: s.max(0),
    "median": lambda s: np.median(s, axis=0),
    # noisy-or is kept computable for analysis but is NOT a selection
    # candidate: it saturates by construction as the pool grows (round-4
    # measured: 12 entries pushed the expected-area threshold to ~1.0 and
    # an image to dice 0.0 on test — results/r4_ex_mt05_noisyor/).
    "noisyor": lambda s: 1.0 - np.prod(1.0 - s, axis=0),
}
SELECTABLE_RULES = ("mean", "max", "median")
# A candidate must beat mean on val by this margin to be selected; below
# it the difference is qualification-set noise (round-4 measured: noisy-or
# "won" by 1e-4 on val and lost 0.18 mean dice on test).
FUSION_SELECT_MARGIN = 0.005


def fused_val_dice(val_dir: Path, pool, imgs, rule: str,
                   area_estimate: str = "fused") -> float:
    scores = []
    for img in imgs:
        stack = np.stack([np.clip(np.load(val_dir / f"{l}_{img}.npy"), 0, 1)
                          for l in pool])
        fused = FUSION_RULES[rule](stack)
        target = (float(np.median(stack.sum(axis=(1, 2))))
                  if area_estimate == "member_median" else None)
        gt = np.load(val_dir / f"gt_{img}.npy").astype(bool)
        scores.append(dice(fused > area_threshold(fused, target_area=target),
                           gt))
    return float(np.mean(scores))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val-dir", required=True)
    ap.add_argument("--out", required=True,
                    help="point.json to write (protocol operating point)")
    ap.add_argument("--floor", type=float, default=0.5)
    ap.add_argument("--test-dir", default=None,
                    help="If given, members lacking COMPLETE coverage of the "
                         "test split's images are dropped up front — a drive "
                         "killed between map stages must not leave a member "
                         "the pool qualifies but the apply cannot load")
    ap.add_argument("--area-estimate", default="member_median",
                    choices=["fused", "member_median"],
                    help="Lesion-area estimate the expected-area threshold "
                         "matches: the fused map's own soft mass (the r2/r3 "
                         "protocol), or the MEDIAN over members of their own "
                         "soft mass (protocol v2 — robust to the diffuse-"
                         "mass-sprayer members drive-5 forensics found "
                         "dragging the fused threshold down; on images "
                         "where members agree the two coincide)")
    ap.add_argument("--fusion-from-val", action="store_true",
                    help="Pick the fusion rule (mean/max/median/noisy-or) by "
                         "the qualified pool's fused VAL-map dice under the "
                         "area rule — still val-only, frozen before any "
                         "test input")
    args = ap.parse_args()

    val_dir = Path(args.val_dir)
    labels = sorted(set(f.name.rsplit("_IDRiD_", 1)[0]
                        for f in val_dir.glob("*_IDRiD_*.npy")
                        if not f.name.startswith("gt_")
                        and not f.name.endswith("_mom.npy")))
    if args.test_dir:
        test_dir = Path(args.test_dir)
        test_imgs = sorted(f.name[3:-4] for f in test_dir.glob("gt_*.npy"))
        covered = [l for l in labels
                   if all((test_dir / f"{l}_{i}.npy").exists()
                          for i in test_imgs)]
        for l in sorted(set(labels) - set(covered)):
            print(f"[{l}] DROPPED: incomplete test-map coverage", flush=True)
        labels = covered
    # score only val images covered by EVERY label (a drive interrupted
    # mid-image leaves a gt without maps; scoring members on different
    # image subsets would make the floor incomparable across members)
    imgs = sorted(f.name[3:-4] for f in val_dir.glob("gt_*.npy")
                  if all((val_dir / f"{l}_{f.name[3:]}").exists()
                         for l in labels))
    # qualify on the base member; the flip variant inherits (same weights)
    base = sorted(l for l in labels if not l.endswith("F"))
    vals, pool = {}, []
    for label in base:
        vals[label] = member_val_dice(val_dir, label, imgs)
        ok = vals[label] >= args.floor
        if ok:
            pool += [label] + ([f"{label}F"] if f"{label}F" in labels else [])
        print(f"[{label}] val-map protocol dice {vals[label]:.4f} -> "
              f"{'pool' if ok else f'EXCLUDED (floor {args.floor})'}",
              flush=True)

    fusion, fusion_note = "mean", None
    if args.fusion_from_val and pool:
        by_rule = {r: fused_val_dice(val_dir, pool, imgs, r,
                                     args.area_estimate)
                   for r in SELECTABLE_RULES}
        best = max(by_rule, key=by_rule.get)
        # leave the mean default only on a margin above val noise
        fusion = (best if by_rule[best] - by_rule["mean"]
                  > FUSION_SELECT_MARGIN else "mean")
        fusion_note = {k: round(v, 4) for k, v in by_rule.items()}
        print(f"fusion rule by fused val-map dice: {fusion_note} "
              f"-> {fusion} (margin {FUSION_SELECT_MARGIN} over mean to "
              f"switch)", flush=True)

    point = {
        "members": sorted(pool),
        "member_val_map_dice": {k: round(v, 4) for k, v in vals.items()},
        "val_floor": args.floor,
        "area_estimate": args.area_estimate,
        "pool_rule": ("val-map floor: member's own whole-image maps must "
                      "score >= floor mean dice on the VAL split under the "
                      "protocol's expected-area rule (same inference regime "
                      "as the protocol; no test input)"),
        "fusion": fusion, "weight": 1.0,
        **({"fusion_val_dice_by_rule": fusion_note} if fusion_note else {}),
        "threshold_mode": "area", "threshold": 1.0,
        "objective": (f"val-frozen fusion rule ({fusion} maximizes the "
                      "qualified pool's fused val-map dice); expected-area "
                      "threshold pinned at w_a=1.0" if fusion_note else
                      "none (parameter-free protocol: all qualified "
                      "members, mean fusion, expected-area threshold at "
                      "w_a=1.0)"),
    }
    Path(args.out).write_text(json.dumps(point, indent=2))
    print(f"wrote {args.out}: {len(pool)} pool entries", flush=True)


if __name__ == "__main__":
    main()
