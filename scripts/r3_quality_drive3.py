#!/usr/bin/env python
"""Round-3 EX quality drive, part 3: the trimmed remainder of drive 2.

Drive 2 was interrupted twice (session restarts) and its remaining plan
did not fit the TPU window: it computed val maps for all 14 val images
when pool qualification only scores the 5-image intersection the
drive-5 members already cover (IDRiD_55-59), and its scale-1.0 map
stages cost ~160 s/map (4x the 0.5-scale cost).  Trimmed plan, ordered
by value per TPU-minute with the plaque member first:

  1. e2e4 (seed 7 @0.5, already trained, val maps done): TEST maps.
  2. f2e4 (seed 1337 @1.0 + large-lesion oversampling — the IDRiD_81
     plaque member; scale 1.0 + oversampling measured +0.21 on 81 in
     round 2): train, then maps on val 55-59 + test, base label only
     (no flip TTA at 1.0 — halves the dominant map cost).
  3. g2e4 (seed 3 @0.5, seed diversity): train, then maps on val
     55-59 + test with flip TTA, IF the wall-clock deadline allows.

The a2e4 cross-scale TTA stage is dropped: round 2 measured scale-TTA
members as individually weak (likely excluded by the val floor), and
their 1.0-scale maps are the most expensive per qualified member.

Stages are marker/skip-guarded (resume-safe).  DEADLINE_UTC (env,
HH:MM) gates each remaining stage so the TPU is free for the driver's
bench window.  Apply on CPU afterwards:

  python scripts/pool_rule.py --val-dir .maps/r3_ex_val \
      --out .maps/r3_ex_test/point.json --floor 0.5 --fusion-from-val
  python scripts/tune_fusion.py --val-dir .maps/r3_ex_test \
      --test-dir .maps/r3_ex_test --output-dir results/r3_protocol_free_ex \
      --point-json .maps/r3_ex_test/point.json
"""

import os
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.r3_quality_drive import (  # noqa: E402
    DATA_DIR, probe_tpu, best_val_score, train_member)

TEST_DIR = REPO / ".maps" / "r3_ex_test"
VAL_DIR = REPO / ".maps" / "r3_ex_val"
VAL_IMGS = [f"IDRiD_{i}" for i in range(55, 60)]  # the qualification set

MEMBERS = [
    ("f2e4", dict(seed=1337, img_scale=1.0, epochs=18, oversample_lesion=20.0,
                  learning_rate=2e-4, early_stopping_patience=10),
     False),  # no flip variant: scale-1.0 maps cost ~160 s each
    ("g2e4", dict(seed=3, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10),
     True),
]


def deadline_passed(stage: str) -> bool:
    spec = os.environ.get("DEADLINE_UTC")
    if not spec:
        return False
    now = datetime.now(timezone.utc)
    hh, mm = map(int, spec.split(":"))
    if (now.hour, now.minute) >= (hh, mm):
        print(f"[deadline {spec}Z] skipping {stage}", flush=True)
        return True
    return False


def compute_maps(member_specs, split: str, outdir: Path, images=None) -> None:
    import scripts.compute_member_maps as cmm

    argv = ["compute_member_maps", "--lesion-type", "EX", "--split", split,
            "--outdir", str(outdir), "--data-dir", DATA_DIR,
            "--samples", "10", "--patch-size", "512"]
    for spec in member_specs:
        argv += ["--member", spec]
    for img in images or []:
        argv += ["--images", img]
    old = sys.argv
    sys.argv = argv
    try:
        cmm.main()
    finally:
        sys.argv = old


def main():
    probe_tpu()
    t_start = time.time()

    # stage 1: e2e4 test maps (training + val maps done in drive 2)
    e2e4_run = (REPO / "checkpoints" / "r3_e2e4" / "DRIVE_DONE").read_text().strip()
    compute_maps([f"e2e4={e2e4_run}@0.5", f"e2e4F={e2e4_run}@0.5:h"],
                 "test", TEST_DIR)
    print(f"[e2e4] test maps done ({(time.time() - t_start) / 60:.1f} min)",
          flush=True)

    for label, kw, flip in MEMBERS:
        if deadline_passed(f"{label} stage"):
            break
        run = train_member(label, kw)
        val = best_val_score(run)
        print(f"[{label}] best val dice {val:.4f} (train-loop regime; "
              "the val-map floor decides pool admission)", flush=True)
        scale = kw["img_scale"]
        specs = [f"{label}={run}@{scale}"]
        if flip:
            specs.append(f"{label}F={run}@{scale}:h")
        compute_maps(specs, "val", VAL_DIR, images=VAL_IMGS)
        compute_maps(specs, "test", TEST_DIR)
        print(f"[{label}] maps done ({(time.time() - t_start) / 60:.1f} min "
              "elapsed)", flush=True)

    print("drive-3 complete; apply on CPU:", flush=True)
    print(f"  python scripts/pool_rule.py --val-dir {VAL_DIR} "
          f"--out {TEST_DIR / 'point.json'} --floor 0.5 --fusion-from-val",
          flush=True)
    print(f"  python scripts/tune_fusion.py --val-dir {TEST_DIR} "
          f"--test-dir {TEST_DIR} --output-dir results/r3_protocol_free_ex "
          f"--point-json {TEST_DIR / 'point.json'}", flush=True)


if __name__ == "__main__":
    main()
