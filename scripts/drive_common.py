"""Shared plumbing for the quality-drive scripts (family_drive.py and the
bootstrap presets): TPU health probe, member training with marker-file
resume, member-map staging, and the drive deadline gate.

Extracted from the r3_quality_drive*.py generations (now deleted; their
measured outcomes live in RESULTS.md and git history).
"""

from __future__ import annotations

import json
import sys
import time
from datetime import datetime, timedelta, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

DATA_DIR = "/root/reference/data"


def probe_tpu(max_tries: int = 30) -> None:
    """Patient health probe: tiny op, clear_backends + 10-min sleeps on
    failure (post-drop outages last hours; cascading stage failures are
    worse than waiting).  Also installs INFO logging so the training
    loop's epoch/val lines reach the drive log."""
    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
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
            except Exception:  # noqa: BLE001
                pass
            time.sleep(600)
    raise RuntimeError("TPU never became healthy")


def make_deadline(spec: str | None) -> datetime | None:
    """Parse DEADLINE_UTC once at drive start into an absolute datetime.

    Accepts a full ISO timestamp ("2026-08-19T21:30") or "HH:MM", which
    means the NEXT occurrence of that UTC wall time (so an evening deadline
    set before midnight still expires correctly after it — the old
    (hour, minute) tuple comparison broke in both directions across
    midnight)."""
    if not spec:
        return None
    now = datetime.now(timezone.utc)
    if "T" in spec or "-" in spec:
        dt = datetime.fromisoformat(spec)
        return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
    hh, mm = map(int, spec.split(":"))
    dt = now.replace(hour=hh, minute=mm, second=0, microsecond=0)
    if dt <= now:
        dt += timedelta(days=1)
    return dt


def deadline_passed(deadline: datetime | None, stage: str) -> bool:
    if deadline is not None and datetime.now(timezone.utc) >= deadline:
        print(f"[deadline {deadline.isoformat()}] skipping {stage}",
              flush=True)
        return True
    return False


def best_val_score(run_dir: str) -> float:
    state = json.loads((Path(run_dir) / "host_state.json").read_text())
    return float(state["best_val_score"])


def train_member(label: str, kw: dict, tag: str = "r3",
                 lesion_type: str = "EX", data_dir: str = DATA_DIR,
                 patch_size: int = 512, batch_size: int = 6,
                 grad_accum: int = 2) -> str:
    """Train one pool member (marker-file resume) -> its run dir."""
    from vaeunet_tpu.training.checkpoint import latest_run_dir
    from vaeunet_tpu.training.config import TrainConfig
    from vaeunet_tpu.training.loop import train_model

    ckdir = REPO / "checkpoints" / f"{tag}_{label}"
    marker = ckdir / "DRIVE_DONE"
    config = TrainConfig(
        model_type="resnet", lesion_type=lesion_type, data_dir=data_dir,
        patch_size=patch_size, gradient_accumulation_steps=grad_accum,
        amp=True, checkpoint_dir=str(ckdir),
        **{"batch_size": batch_size, **kw})
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


def compute_maps(member_specs, split: str, outdir: Path, lesion_type: str,
                 data_dir: str = DATA_DIR, samples: int = 10,
                 patch_size: int = 512, images=None) -> None:
    """Stage cached probability maps via scripts/compute_member_maps.py
    (idempotent: existing map files are skipped)."""
    import scripts.compute_member_maps as cmm

    argv = ["compute_member_maps", "--lesion-type", lesion_type,
            "--split", split, "--outdir", str(outdir),
            "--data-dir", data_dir, "--samples", str(samples),
            "--patch-size", str(patch_size)]
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
