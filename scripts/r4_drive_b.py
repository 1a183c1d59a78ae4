#!/usr/bin/env python
"""Round-4 drive B: multi-task members, the MA protocol pool, the grid's
ablation members, and the HE/SE/OD family maps — one TPU process, staged
by measured value per TPU-minute, resume-safe, DEADLINE_UTC-gated per stage.

Stages:
  1. mt05 — multi-task (lesion_type=ALL, 5-channel) member at scale 0.5.
     Its EX channel (c0) joins the EX protocol pool: the shared encoder sees
     5x the supervision per image, and the HE channel teaches the
     confluent-blob appearance the EX plaque regime (IDRiD_81) needs.
  2. ma1 — the MA member (scale 1.0); protocol maps ma1@1.0 + ma1@0.5 TTA +
     h-flip (the r2 recipe that beat the reference's committed 0.449).
  3. mt10 — multi-task at scale 1.0 with lesion oversampling (plaque regime).
  4. nolat / latb — EX latent-injection ablation members for the
     T x N replication grid (scripts/replication_grid.py): 'none' and
     'bottleneck' counterparts of the reference's *_nolatent / *_latent
     configs (/root/reference/uncertainty/).
  5. HE / SE / OD family maps from the multi-task channels (+DEDICATED maps
     can be added later): HE on test (masks exist), SE/OD on val (the
     snapshot ships no SE/OD test masks — RESULTS.md, SE split limitation).

Afterwards on CPU:
  python scripts/pool_rule.py --val-dir .maps/r4_ex_val --test-dir .maps/r4_ex_test \
      --out .maps/r4_ex_test/point.json --floor 0.5 --fusion-from-val
  python scripts/tune_fusion.py --val-dir .maps/r4_ex_test --test-dir .maps/r4_ex_test \
      --output-dir results/r4_protocol_free_ex --point-json .maps/r4_ex_test/point.json
  (and the MA/HE/SE/OD applies printed at the end)
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
        print(f"[{label}] done ({(time.time() - t0) / 60:.1f} min elapsed)",
              flush=True)

    # -- 1. multi-task member, scale 0.5 --------------------------------
    if not deadline_passed(deadline, "mt05"):
        run = train_member(
            "mt05", dict(seed=42, img_scale=0.5, epochs=60,
                         learning_rate=2e-4, batch_size=8,
                         early_stopping_patience=10, n_classes=5),
            tag="r4", lesion_type="ALL")
        print(f"[mt05] best train-loop val dice {best_val_score(run):.4f} "
              "(5-channel global dice; the EX val-map floor decides pool "
              "admission)", flush=True)
        specs = [f"mt05={run}@0.5:c0", f"mt05F={run}@0.5:h:c0"]
        compute_maps(specs, "test", EX_TEST, "EX")
        compute_maps(specs, "val", EX_VAL, "EX", images=VAL_IMGS)
        stamp("mt05 EX maps")

    # -- 2. MA member + protocol maps ------------------------------------
    if not deadline_passed(deadline, "ma1"):
        run = train_member(
            "ma1", dict(seed=42, img_scale=1.0, epochs=25,
                        learning_rate=2e-4, early_stopping_patience=10),
            tag="r4", lesion_type="MA")
        print(f"[ma1] best val dice {best_val_score(run):.4f}", flush=True)
        # four TTA entries: the stronger committed reference MA number is
        # analysis/MA_T1.0_N10 mean 0.494 (not the 0.449 of
        # uncertainty/MA_T1.0_N15 restricted to the 5 test images), so the
        # pool gets the extra cheap 0.5-scale flip
        specs = [f"ma10={run}@1.0", f"ma05={run}@0.5",
                 f"ma10F={run}@1.0:h", f"ma05F={run}@0.5:h"]
        compute_maps(specs, "test", REPO / ".maps" / "r4_ma_test", "MA")
        stamp("ma1 maps")

    # -- 3. multi-task member, scale 1.0 + oversampling ------------------
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
        stamp("mt10 EX maps")

    # -- 4. grid ablation members (train only; the grid analyzes them) ---
    # "nolatent" in the reference's committed ablation still shows sampled
    # uncertainty (uncertainty/EX_T1.0_N15_nolatent: sparsification 0.92,
    # error-AUROC 0.97, uncertain pixels > 0), so it cannot be the 'none'
    # strategy (identical samples, zero std) — it is the no-BOTTLENECK
    # injection ('inject_no_bottleneck': z reaches the decoder levels but
    # not the bottleneck).  '_latent' is the complementary bottleneck-only
    # ablation.
    for label, inj in (("nolat", "inject_no_bottleneck"),
                       ("latb", "bottleneck")):
        if deadline_passed(deadline, label):
            break
        run = train_member(
            label, dict(seed=42, img_scale=0.5, epochs=60,
                        learning_rate=2e-4, batch_size=8,
                        early_stopping_patience=10, latent_injection=inj),
            tag="r4", lesion_type="EX")
        print(f"[{label}] best val dice {best_val_score(run):.4f}",
              flush=True)
        stamp(label)

    # -- 5. family maps from the multi-task channels ---------------------
    mt05_marker = REPO / "checkpoints" / "r4_mt05" / "DRIVE_DONE"
    if mt05_marker.exists():
        run = mt05_marker.read_text().strip()
        fam = [("HE", "test", 1), ("SE", "val", 3), ("OD", "val", 4)]
        for lesion, split, ch in fam:
            if deadline_passed(deadline, f"{lesion} family maps"):
                break
            outdir = REPO / ".maps" / f"r4_{lesion.lower()}_{split}"
            specs = [f"mt05={run}@0.5:c{ch}", f"mt05F={run}@0.5:h:c{ch}"]
            compute_maps(specs, split, outdir, lesion)
            stamp(f"{lesion} maps")

    print("drive B done; apply on CPU:", flush=True)
    for lesion, split in (("ex", "test"), ("ma", "test"), ("he", "test"),
                          ("se", "val"), ("od", "val")):
        d = REPO / ".maps" / (f"r4_{lesion}_{split}"
                              if lesion != "ex" else "r4_ex_test")
        print(f"  python scripts/tune_fusion.py --val-dir {d} --test-dir {d} "
              f"--output-dir results/r4_protocol_free_{lesion} "
              f"--point-json <point>", flush=True)


if __name__ == "__main__":
    main()
