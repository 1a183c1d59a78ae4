#!/usr/bin/env python
"""Round-4 EX bootstrap drive: rebuild the full protocol pool from a WIPED
environment (no checkpoints/, no .maps/) with everything the round-2/3
drives measured baked in.  This is the first-action script for a fresh
round: one TPU process, resume-safe at every stage, leaves a coherent
protocol pool however early it is interrupted.

Baked-in lessons (all measured, see RESULTS.md):
  * lr-2e-4 / patience-10 members only — the config-default lr-1e-4 tail
    members (a05/c10) sprayed diffuse mass on the tiny-lesion image and
    were excluded by the val-map rule; p2e4 (0.25x) collapsed twice.
  * Qualification happens in the protocol's OWN inference regime: member
    maps on the 5-image val intersection (IDRiD_55-59), area-rule dice,
    floor 0.5 (`scripts/pool_rule.py`) — the training-loop val floor
    passed both a degenerate member and the mass-sprayers.
  * The inference logvar clamp (vae_utils.sample_from_latent) guards the
    whole-image-encode OOD blowup that zeroed a2e4's maps in drive 5.
  * TEST maps are staged BEFORE val maps per member: qualification reads
    the val maps, so a kill between the two stages must leave the member
    unqualified (no val maps) rather than qualified-but-unapplicable
    (val maps without test maps -> FileNotFoundError at apply time).
  * Scale-1.0 members stop at <=30 epochs (train-longer overfits, r2).
  * Flip-TTA at scale 0.5 everywhere; at scale 1.0 only for the two
    strongest regime members (c2e4 plaque, i2e4 tiny-lesion) — the r3
    pool's gap vs the curated r2 pool was diversity, and a 1.0-scale flip
    map costs ~160 s/image, so the tail 1.0 members stay flipless.
  * Per-member staging: train -> test maps -> val maps -> next member.

Measured cost model (single tunneled v5e): ~2 h training for the eight
members + ~3 h of maps => the whole drive fits inside one round's TPU
window; DEADLINE_UTC (env: "HH:MM" = next occurrence, or a full ISO
timestamp) gates each MEMBER stage — members already staged are kept.

Apply afterwards in a separate CPU process (wedge discipline):

  python scripts/pool_rule.py --val-dir .maps/r4_ex_val \
      --test-dir .maps/r4_ex_test \
      --out .maps/r4_ex_test/point.json --floor 0.5 --fusion-from-val
  python scripts/tune_fusion.py --val-dir .maps/r4_ex_test \
      --test-dir .maps/r4_ex_test --output-dir results/r4_protocol_free_ex \
      --point-json .maps/r4_ex_test/point.json

Reference counterpart: the committed EX_T1.0_N10 analysis protocol
(/root/reference/analyze_model.py:694, uncertainty/EX_T1.0_N10) — mean
test Dice 0.708 on IDRiD_77-81 with an ImageNet-pretrained encoder.
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

VAL_DIR = REPO / ".maps" / "r4_ex_val"
TEST_DIR = REPO / ".maps" / "r4_ex_test"
VAL_IMGS = [f"IDRiD_{i}" for i in range(55, 60)]  # qualification set

# Ordered by measured protocol value per TPU-minute (drive-5 per-member
# area-rule test dice / train wall): strongest first so an interrupted
# drive keeps the best pool prefix.  `flip` adds an h-flip TTA label.
MEMBERS = [
    # drive-5 protocol dice 0.6225 (guarded), 17 min
    ("a2e4", dict(seed=42, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10), True),
    # the plaque member: +0.21 on IDRiD_81 in r2; 0.6021, 30 min
    ("c2e4", dict(seed=42, img_scale=1.0, epochs=30, oversample_lesion=20.0,
                  learning_rate=2e-4, early_stopping_patience=10), True),
    # best member on the tiny-lesion image (IDRiD_80 0.512); 15 min
    ("i2e4", dict(seed=7, img_scale=1.0, epochs=18, learning_rate=2e-4,
                  early_stopping_patience=10), True),
    # seed diversity at 0.5; 0.5726, 8.5 min
    ("h05", dict(seed=1337, img_scale=0.5, epochs=60, learning_rate=2e-4,
                 batch_size=8, early_stopping_patience=10), True),
    # deep-supervision diversity; 0.5649, 9 min
    ("d2e4", dict(seed=99, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10,
                  deep_supervision=True), True),
    # plaque-diversity at 1.0 (drive-3 plan, never ran): seed 1337 +
    # oversampling pairs with c2e4 the way h05 pairs with a2e4
    ("f2e4", dict(seed=1337, img_scale=1.0, epochs=18,
                  oversample_lesion=20.0, learning_rate=2e-4,
                  early_stopping_patience=10), False),
    # seed-diversity tail at the cheap scale; the val-map floor decides
    ("g2e4", dict(seed=3, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10), True),
    ("e2e4", dict(seed=7, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10), True),
]


def main():
    probe_tpu()
    deadline = make_deadline(os.environ.get("DEADLINE_UTC"))
    t0 = time.time()
    for label, kw, flip in MEMBERS:
        if deadline_passed(deadline, f"{label} stage"):
            break
        run = train_member(label, kw, tag="r4", lesion_type="EX")
        print(f"[{label}] best train-loop val dice {best_val_score(run):.4f}"
              " (informational; the val-map floor decides admission)",
              flush=True)
        scale = kw["img_scale"]
        specs = [f"{label}={run}@{scale}"]
        if flip:
            specs.append(f"{label}F={run}@{scale}:h")
        # test BEFORE val: see the staging lesson in the module docstring
        compute_maps(specs, "test", TEST_DIR, "EX")
        compute_maps(specs, "val", VAL_DIR, "EX", images=VAL_IMGS)
        print(f"[{label}] maps done ({(time.time() - t0) / 60:.1f} min "
              "elapsed)", flush=True)

    print("bootstrap drive done; apply on CPU:", flush=True)
    print(f"  python scripts/pool_rule.py --val-dir {VAL_DIR} "
          f"--test-dir {TEST_DIR} "
          f"--out {TEST_DIR / 'point.json'} --floor 0.5 --fusion-from-val",
          flush=True)
    print(f"  python scripts/tune_fusion.py --val-dir {TEST_DIR} "
          f"--test-dir {TEST_DIR} --output-dir results/r4_protocol_free_ex "
          f"--point-json {TEST_DIR / 'point.json'}", flush=True)


if __name__ == "__main__":
    main()
