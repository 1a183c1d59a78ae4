#!/usr/bin/env python
"""Round-5 drive tail (fresh process per the stale-process discipline):
the family stages the main drive's deadline would have squeezed out,
trimmed to the 5-image val qualification subset (IDRiD_55-59 — the same
subset the EX protocol qualifies on, stated in RESULTS):

  1. sefoc — dedicated focal-loss SE member (VERDICT r4 #3 SE rescue;
     reference MASegmentationLoss precedent utils/loss.py:95) + val maps.
  2. SE / OD val maps from the mt05 channels on the same subset (the SE
     baseline the rescue is compared against; OD's protocol number).

Resume-safe like the main drive (markers + idempotent map files).
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

VAL_IMGS = [f"IDRiD_{i}" for i in range(55, 60)]


def main():
    probe_tpu()
    deadline = make_deadline(os.environ.get("DEADLINE_UTC"))
    t0 = time.time()

    def stamp(label):
        print(f"[{label}] stage done ({(time.time() - t0) / 60:.1f} min "
              "elapsed)", flush=True)

    if not deadline_passed(deadline, "sefoc"):
        run = train_member(
            "sefoc", dict(seed=42, img_scale=0.5, epochs=60,
                          learning_rate=2e-4, batch_size=8,
                          early_stopping_patience=10, loss="focal",
                          oversample_lesion=10.0), tag="r5",
            lesion_type="SE")
        print(f"[sefoc] best val dice {best_val_score(run):.4f}", flush=True)
        compute_maps([f"sefoc={run}@0.5"], "val", REPO / ".maps" / "r5_se_val",
                     "SE", images=VAL_IMGS)
        stamp("sefoc")

    mt05_marker = REPO / "checkpoints" / "r4_mt05" / "DRIVE_DONE"
    if mt05_marker.exists():
        run = mt05_marker.read_text().strip()
        for lesion, ch in (("SE", 3), ("OD", 4)):
            if deadline_passed(deadline, f"{lesion} mt05 maps"):
                break
            outdir = REPO / ".maps" / f"r5_{lesion.lower()}_val"
            compute_maps([f"mt05={run}@0.5:c{ch}"], "val", outdir, lesion,
                         images=VAL_IMGS)
            stamp(f"{lesion} mt05 maps")

    print("tail drive done", flush=True)


if __name__ == "__main__":
    main()
