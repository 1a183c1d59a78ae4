#!/usr/bin/env python
"""Render the reference-vs-ours table for the T x N replication grid.

Reads every `analysis_metrics.csv` under --ours (results/r4_grid) and the
matching reference config (searched under /root/reference/{uncertainty,
analysis,calibration}), and prints a markdown table of mean dice and
error-AUROC.  Reference means are reported twice: over ALL its committed
rows (the author's fuller local test set) and restricted to the 5 test
images this snapshot ships (IDRiD_77-81) — only the latter is
apples-to-apples.

Pure stdlib — safe beside a live TPU drive.
"""

import argparse
import csv
from pathlib import Path

REF_ROOTS = [Path("/root/reference/uncertainty"),
             Path("/root/reference/analysis"),
             Path("/root/reference/calibration")]
SNAPSHOT_TEST = {f"IDRiD_{i}" for i in range(77, 82)}


def read_csv(path: Path):
    with open(path) as f:
        return list(csv.DictReader(f))


def mean(rows, col, only=None):
    vals = [float(r[col]) for r in rows
            if col in r and r[col] != ""
            and (only is None or r["img_id"] in only)]
    return sum(vals) / len(vals) if vals else None


def fmt(x):
    return f"{x:.4f}" if x is not None else "—"


def find_ref(name: str):
    """Best reference counterpart = the committed CSV covering the most of
    this snapshot's 5 test images (the reference commits the same config
    name under several dirs; analysis/ holds the 5-image runs)."""
    # calibration/ uses "NoLatent" capitalization
    cands = [name, name.replace("_nolatent", "_NoLatent")]
    best, best_cov = None, -1
    for root in REF_ROOTS:
        for c in cands:
            p = root / c / "analysis_metrics.csv"
            if p.exists():
                cov = sum(1 for r in read_csv(p)
                          if r["img_id"] in SNAPSHOT_TEST)
                if cov > best_cov:
                    best, best_cov = p, cov
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="results/r4_grid")
    args = ap.parse_args()

    print("| config | ours dice (5 imgs) | ref dice (same 5) | "
          "ref dice (all rows) | ours errAUROC | ref errAUROC (same 5) |")
    print("|---|---|---|---|---|---|")
    for d in sorted(Path(args.ours).iterdir()):
        csv_path = d / "analysis_metrics.csv"
        if not csv_path.exists():
            continue
        ours = read_csv(csv_path)
        ref_path = find_ref(d.name)
        ref = read_csv(ref_path) if ref_path else []
        print(f"| {d.name} | {fmt(mean(ours, 'dice'))} "
              f"| {fmt(mean(ref, 'dice', SNAPSHOT_TEST))} "
              f"| {fmt(mean(ref, 'dice'))} "
              f"| {fmt(mean(ours, 'error_auroc'))} "
              f"| {fmt(mean(ref, 'error_auroc', SNAPSHOT_TEST))} |")


if __name__ == "__main__":
    main()
