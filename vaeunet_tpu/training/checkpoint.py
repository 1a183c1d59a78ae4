"""Orbax checkpointing with true resume.

The reference saves model/optimizer/scheduler/scaler state + a params dict
(train.py:542-565) under a hyperparameter-encoded directory with a
``best_model.pth`` alias, but its load paths restore weights only — no real
resume (SURVEY.md section 5, checkpoint row).  Here the full training state
(params, BN stats, opt state, PRNG key, step) plus host-side controller
state (plateau scheduler, KL annealer epoch, best score) round-trips, so a
preempted run continues exactly.

Layout (mirrors the reference naming scheme, train.py:62-108,535-541):
  <checkpoint_dir>/<encoded-hparams>/
      step_<n>/          orbax PyTree of TrainState
      best/              alias of the best-dice state
      config.json        TrainConfig
      host_state.json    scheduler/annealer/early-stop state
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.state import TrainState

log = logging.getLogger(__name__)


_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer():
    # singleton so async saves can be awaited across calls
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves():
    """Block until any in-flight async save has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(run_dir: str, state: TrainState, config: TrainConfig,
                    host_state: Optional[Dict[str, Any]] = None,
                    name: str = "best", block: bool = False) -> str:
    """Async by default: the state is staged to host synchronously (orbax),
    then written to (slow, remote) storage in the background while training
    continues — a best-dice save costs ~20s blocking on this filesystem.
    Call wait_for_saves() (or pass block=True) before reading the files.
    """
    run = Path(run_dir).absolute()
    run.mkdir(parents=True, exist_ok=True)
    (run / "config.json").write_text(config.to_json())
    if host_state is not None:
        (run / "host_state.json").write_text(json.dumps(host_state))
    path = run / name
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # a previous save of this path may be live
    ckptr.save(path, state, force=True)
    if block:
        ckptr.wait_until_finished()
    log.info("Saving checkpoint to %s%s", path, "" if block else " (async)")
    return str(path)


def restore_checkpoint(run_dir: str, state: TrainState,
                       name: str = "best") -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of `state` (an abstract/real template)."""
    run = Path(run_dir).absolute()
    wait_for_saves()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
    restored = _checkpointer().restore(run / name, target)
    host_path = run / "host_state.json"
    host_state = json.loads(host_path.read_text()) if host_path.exists() else {}
    return restored, host_state


def load_config(run_dir: str) -> Optional[TrainConfig]:
    p = Path(run_dir) / "config.json"
    if p.exists():
        return TrainConfig.from_json(p.read_text())
    return None


def latest_run_dir(config: TrainConfig) -> str:
    return config.checkpoint_path()
