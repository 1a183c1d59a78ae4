#!/usr/bin/env python
"""Round-3 EX quality drive: retrain the ensemble members and regenerate the
parameter-free protocol inputs (the round-2 checkpoints did not survive the
environment reset; results/ keeps the CSVs but the weights and cached maps
are gone).

ONE process end-to-end (wedge discipline, .claude/skills/verify/SKILL.md):
  1. train three seed/scale-diverse EX members
       a05: scale 0.5, seed 42            (the strong all-round member)
       c10: scale 1.0, seed 42, large-lesion oversampling (the plaque member)
       i10: scale 1.0, seed 7             (diversity)
  2. compute cached test-split probability maps for each member + its
     horizontal-flip TTA variant (scripts/compute_member_maps.py logic)

The protocol apply (mean fusion over all members, per-image expected-area
threshold at w_a=1.0 — zero tuned parameters) is CPU-numpy-heavy and runs
as a SEPARATE process after this one exits:

  python scripts/tune_fusion.py --val-dir <maps> --test-dir <maps> \
      --output-dir results/r3_protocol_free_ex --point-json <point.json>

Stages are marker-file guarded so an interrupted drive resumes.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MAPS_DIR = REPO / ".maps" / "r3_ex_test"
DATA_DIR = "/root/reference/data"

# Ordered strongest-expected-first: the previous environment's drive measured
# the config-default lr-1e-4 members early-stopping at val 0.30-0.65 while
# round-1's best from-scratch recipe (lr 2e-4 / effective batch 16, patience
# 10 validations) reached val 0.665-0.687 — so the proven operating point
# trains first and weaker diversity members trail.  Each member's maps are
# computed immediately after its training (see main), so an interrupted
# drive still leaves a coherent protocol pool.
MEMBERS = [
    # label, train-config overrides
    ("a2e4", dict(seed=42, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10)),
    # the plaque member: scale 1.0 + large-lesion oversampling recovered
    # IDRiD_81 0.40 -> 0.68 in round 2
    ("c2e4", dict(seed=42, img_scale=1.0, epochs=30, oversample_lesion=20.0,
                  learning_rate=2e-4, early_stopping_patience=10)),
    ("h05", dict(seed=1337, img_scale=0.5, epochs=60, learning_rate=2e-4,
                 batch_size=8, early_stopping_patience=10)),
    # deep-supervision member (da8ae1d added the feature as a from-scratch
    # training aid; this is its first measured run) — diversity for fusion,
    # and the val floor below drops it if it underperforms
    ("d2e4", dict(seed=99, img_scale=0.5, epochs=60, learning_rate=2e-4,
                  batch_size=8, early_stopping_patience=10,
                  deep_supervision=True)),
    # seed diversity at the strong scale-1.0 point (round 2 kept scale-1.0
    # members at <=18 epochs per the train-longer overfitting measurement)
    ("i2e4", dict(seed=7, img_scale=1.0, epochs=18, learning_rate=2e-4,
                  early_stopping_patience=10)),
    # 0.25x member trades small-lesion acuity for 4x receptive context on
    # the confluent-plaque failure mode (IDRiD_81); its lr-1e-4 variant
    # collapsed at val 0.303 last drive, so it gets the proven recipe too
    ("p2e4", dict(seed=42, img_scale=0.25, epochs=60, oversample_lesion=20.0,
                  learning_rate=2e-4, batch_size=8,
                  early_stopping_patience=10)),
    # config-default lr-1e-4 tail for pool breadth (historically val
    # 0.54-0.61; the floor decides)
    ("a05", dict(seed=42, img_scale=0.5, epochs=60)),
    ("c10", dict(seed=42, img_scale=1.0, epochs=18, oversample_lesion=20.0)),
]

# Pre-registered pool-qualification rule (val-split only, never test):
# a member joins the protocol pool iff its best validation dice >= 0.5.
# Rationale: the parameter-free protocol mean-fuses ALL pool members, so a
# collapsed run (p25 stopped at val 0.303) would dilute every image; a
# val-based floor keeps the protocol honest (no test-set selection).
VAL_FLOOR = 0.5


def probe_tpu(max_tries: int = 30) -> None:
    """Patient health probe: tiny op, clear_backends + 10-min sleeps on
    failure (post-drop outages last hours; cascading stage failures are
    worse than waiting)."""
    import jax
    import jax.numpy as jnp
    for i in range(max_tries):
        try:
            assert float((jnp.ones((4, 4)) + 1).sum()) == 32.0
            print(f"tpu probe ok (backend={jax.default_backend()})",
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001
            print(f"tpu probe {i}: {type(e).__name__}: {e}", flush=True)
            try:
                jax.clear_backends()
            except Exception:
                pass
            time.sleep(600)
    raise RuntimeError("TPU never became healthy")


def best_val_score(run_dir: str) -> float:
    state = json.loads((Path(run_dir) / "host_state.json").read_text())
    return float(state["best_val_score"])


def train_member(label: str, kw: dict) -> str:
    from vaeunet_tpu.training.checkpoint import latest_run_dir
    from vaeunet_tpu.training.config import TrainConfig
    from vaeunet_tpu.training.loop import train_model

    ckdir = REPO / "checkpoints" / f"r3_{label}"
    marker = ckdir / "DRIVE_DONE"
    config = TrainConfig(
        model_type="resnet", lesion_type="EX", data_dir=DATA_DIR,
        patch_size=512, gradient_accumulation_steps=2,
        amp=True, checkpoint_dir=str(ckdir),
        **{"batch_size": 6, **kw})
    if marker.exists():
        run = marker.read_text().strip()
        print(f"[{label}] already trained: {run}", flush=True)
        return run
    print(f"[{label}] training: {kw}", flush=True)
    t0 = time.time()
    train_model(config)
    run = latest_run_dir(config)
    marker.write_text(run)
    print(f"[{label}] done in {(time.time() - t0) / 60:.1f} min -> {run}",
          flush=True)
    return run


def compute_maps_for(label: str, run: str, scale: float) -> None:
    import scripts.compute_member_maps as cmm

    argv = ["compute_member_maps", "--lesion-type", "EX", "--split", "test",
            "--outdir", str(MAPS_DIR), "--data-dir", DATA_DIR,
            "--samples", "10", "--patch-size", "512",
            "--member", f"{label}={run}@{scale}",
            "--member", f"{label}F={run}@{scale}:h"]
    old = sys.argv
    sys.argv = argv
    try:
        cmm.main()
    finally:
        sys.argv = old


def write_point(pool: list, vals: dict) -> None:
    point = {
        "members": sorted(pool + [f"{l}F" for l in pool]),
        "member_val_dice": {l: round(vals[l], 4) for l in sorted(vals)},
        "val_floor": VAL_FLOOR,
        "fusion": "mean", "weight": 1.0,
        "threshold_mode": "area", "threshold": 1.0,
        "objective": ("none (parameter-free protocol: all members, mean "
                      "fusion, expected-area threshold at w_a=1.0)"),
    }
    MAPS_DIR.mkdir(parents=True, exist_ok=True)
    (MAPS_DIR / "point.json").write_text(json.dumps(point, indent=2))


def main():
    probe_tpu()
    vals, pool = {}, []
    # train -> qualify -> maps per member, so an interrupted drive leaves a
    # coherent pool (maps + point.json) for the members finished so far
    for label, kw in MEMBERS:
        run = train_member(label, kw)
        vals[label] = best_val_score(run)
        ok = vals[label] >= VAL_FLOOR
        tag = "pool" if ok else f"EXCLUDED (val floor {VAL_FLOOR})"
        print(f"[{label}] best val dice {vals[label]:.4f} -> {tag}",
              flush=True)
        if ok:
            compute_maps_for(label, run, kw["img_scale"])
            pool.append(label)
            write_point(sorted(pool), vals)
    print("drive complete; apply the protocol in a separate CPU process:",
          flush=True)
    print(f"  python scripts/tune_fusion.py --val-dir {MAPS_DIR} "
          f"--test-dir {MAPS_DIR} --output-dir results/r3_protocol_free_ex "
          f"--point-json {MAPS_DIR / 'point.json'}", flush=True)


if __name__ == "__main__":
    main()
