#!/usr/bin/env python
"""Round-5 outcome drive: finish the VERDICT-r4 asks in one TPU process.

The r4 checkpoints and .maps survived into this round, so the drive trains
only what is missing and stages maps incrementally (everything here is
marker-file / existing-file resume-safe).  Stage order packs the round's
TPU window by *guaranteed* outcome value first (VERDICT r4: grid #2,
families #3, complete pool #4 are deterministic executions; the EX-parity
levers #1 are probabilistic), with the probabilistic members gated last:

  1. e2e4   — the deadline-skipped 8th bootstrap member (VERDICT #4:
              completes the wiped-env pool; its maps make the full-pool
              v2 apply a 14-entry pool).
  2. ma1    — the MA member + 3-entry TTA protocol maps (VERDICT #3: the
              r2 recipe that beat the reference's committed 0.449; also
              the replication grid's MA model).
  3. nolat / latb — EX latent-injection ablation members for the grid's
              *_nolatent / *_latent configs (VERDICT #2); see
              r4_drive_b.py stage-4 docstring for the mapping argument.
  4. HE / SE / OD family maps from the surviving mt05 channels (VERDICT
              #3: protocol-grade family numbers).  OD restricted to the
              5-image val qualification set (cost; stated in RESULTS).
  5. sefoc  — dedicated focal-loss SE member (VERDICT #3's SE rescue
              lever; reference MASegmentationLoss precedent,
              utils/loss.py:95) + val maps.
  6. mt10   — scale-1.0 multi-task + oversampling (VERDICT #1b: the mt05
              negative only covers scale 0.5); EX channel joins the pool.
              Gated last: probabilistic value.
  7. j2e4   — a second scale-1.0 plaque-recipe draw (seed 21, batch 24
              per VERDICT #7): the r2 lever that moved IDRiD_81
              0.40->0.68 has high run-to-run variance (r2c 0.70 vs r4
              c2e4 0.51 on 81); another independent draw, val floor
              decides admission.

Afterwards on CPU (printed at the end): pool_rule + tune_fusion applies
for EX (full pool, v2 fusion selection), MA, HE, SE, OD; then
scripts/replication_grid.py for the T x N grid in a fresh TPU process
(stale-process discipline: this drive stages ~6 members).

Reference counterparts: analysis/EX_T1.0_N10 (0.708 mean test dice),
uncertainty/MA_T1.0_N15 et al (the grid), utils/loss.py:95 (focal).
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.drive_common import (  # noqa: E402
    best_val_score, compute_maps, deadline_passed, make_deadline, probe_tpu,
    train_member)

EX_VAL = REPO / ".maps" / "r4_ex_val"
EX_TEST = REPO / ".maps" / "r4_ex_test"
VAL_IMGS = [f"IDRiD_{i}" for i in range(55, 60)]  # EX qualification set


def main():
    probe_tpu()
    deadline = make_deadline(os.environ.get("DEADLINE_UTC"))
    t0 = time.time()

    def stamp(label):
        print(f"[{label}] stage done ({(time.time() - t0) / 60:.1f} min "
              "elapsed)", flush=True)

    # -- 1. e2e4: the missing 8th bootstrap member -----------------------
    if not deadline_passed(deadline, "e2e4"):
        run = train_member(
            "e2e4", dict(seed=7, img_scale=0.5, epochs=60,
                         learning_rate=2e-4, batch_size=8,
                         early_stopping_patience=10), tag="r4",
            lesion_type="EX")
        print(f"[e2e4] best train-loop val dice {best_val_score(run):.4f}",
              flush=True)
        specs = [f"e2e4={run}@0.5", f"e2e4F={run}@0.5:h"]
        compute_maps(specs, "test", EX_TEST, "EX")
        compute_maps(specs, "val", EX_VAL, "EX", images=VAL_IMGS)
        stamp("e2e4")

    # -- 2. MA member + protocol maps (r2-winning 3-entry TTA pool) ------
    if not deadline_passed(deadline, "ma1"):
        run = train_member(
            "ma1", dict(seed=42, img_scale=1.0, epochs=25,
                        learning_rate=2e-4, early_stopping_patience=10),
            tag="r5", lesion_type="MA")
        print(f"[ma1] best val dice {best_val_score(run):.4f}", flush=True)
        specs = [f"ma10={run}@1.0", f"ma05={run}@0.5", f"ma05F={run}@0.5:h"]
        compute_maps(specs, "test", REPO / ".maps" / "r5_ma_test", "MA")
        stamp("ma1")

    # -- 3. grid ablation members (train only; the grid analyzes them) ---
    for label, inj in (("nolat", "inject_no_bottleneck"),
                       ("latb", "bottleneck")):
        if deadline_passed(deadline, label):
            break
        run = train_member(
            label, dict(seed=42, img_scale=0.5, epochs=60,
                        learning_rate=2e-4, batch_size=8,
                        early_stopping_patience=10, latent_injection=inj),
            tag="r5", lesion_type="EX")
        print(f"[{label}] best val dice {best_val_score(run):.4f}",
              flush=True)
        stamp(label)

    # -- 4. family maps from the surviving mt05 channels -----------------
    mt05_marker = REPO / "checkpoints" / "r4_mt05" / "DRIVE_DONE"
    if mt05_marker.exists():
        run = mt05_marker.read_text().strip()
        fam = [("HE", "test", 1, None), ("SE", "val", 3, None),
               ("OD", "val", 4, VAL_IMGS)]
        for lesion, split, ch, imgs in fam:
            if deadline_passed(deadline, f"{lesion} family maps"):
                break
            outdir = REPO / ".maps" / f"r5_{lesion.lower()}_{split}"
            specs = [f"mt05={run}@0.5:c{ch}"]
            compute_maps(specs, split, outdir, lesion, images=imgs)
            stamp(f"{lesion} mt05 maps")

    # -- 5. SE rescue: dedicated focal-loss member -----------------------
    if not deadline_passed(deadline, "sefoc"):
        run = train_member(
            "sefoc", dict(seed=42, img_scale=0.5, epochs=60,
                          learning_rate=2e-4, batch_size=8,
                          early_stopping_patience=10, loss="focal",
                          oversample_lesion=10.0), tag="r5",
            lesion_type="SE")
        print(f"[sefoc] best val dice {best_val_score(run):.4f}", flush=True)
        specs = [f"sefoc={run}@0.5"]
        compute_maps(specs, "val", REPO / ".maps" / "r5_se_val", "SE")
        stamp("sefoc")

    # -- 6. mt10: scale-1.0 multi-task + oversampling (gated tail) -------
    if not deadline_passed(deadline, "mt10"):
        run = train_member(
            "mt10", dict(seed=42, img_scale=1.0, epochs=30,
                         oversample_lesion=20.0, learning_rate=2e-4,
                         early_stopping_patience=10, n_classes=5),
            tag="r4", lesion_type="ALL")
        print(f"[mt10] best train-loop val dice {best_val_score(run):.4f}",
              flush=True)
        specs = [f"mt10={run}@1.0:c0"]
        compute_maps(specs, "test", EX_TEST, "EX")
        compute_maps(specs, "val", EX_VAL, "EX", images=VAL_IMGS)
        stamp("mt10")

    # -- 7. j2e4: second plaque-recipe draw, batch 24 (VERDICT #7) -------
    if not deadline_passed(deadline, "j2e4"):
        run = train_member(
            "j2e4", dict(seed=21, img_scale=1.0, epochs=30,
                         oversample_lesion=20.0, learning_rate=2e-4,
                         early_stopping_patience=10), tag="r5",
            lesion_type="EX", batch_size=24, grad_accum=1)
        print(f"[j2e4] best train-loop val dice {best_val_score(run):.4f}",
              flush=True)
        specs = [f"j2e4={run}@1.0"]
        compute_maps(specs, "test", EX_TEST, "EX")
        compute_maps(specs, "val", EX_VAL, "EX", images=VAL_IMGS)
        stamp("j2e4")

    print("r5 drive done; apply on CPU:", flush=True)
    print(f"  python scripts/pool_rule.py --val-dir {EX_VAL} "
          f"--test-dir {EX_TEST} --out {EX_TEST / 'point.json'} "
          "--floor 0.5 --fusion-from-val", flush=True)
    print(f"  python scripts/tune_fusion.py --val-dir {EX_TEST} "
          f"--test-dir {EX_TEST} --output-dir results/r5_protocol_free_ex "
          f"--point-json {EX_TEST / 'point.json'}", flush=True)
    for lesion, split in (("ma", "test"), ("he", "test"), ("se", "val"),
                          ("od", "val")):
        d = REPO / ".maps" / f"r5_{lesion}_{split}"
        print(f"  python scripts/tune_fusion.py --val-dir {d} --test-dir {d} "
              f"--output-dir results/r5_protocol_free_{lesion} "
              "--protocol-free", flush=True)


if __name__ == "__main__":
    main()
