"""Data-parallel training over a TPU mesh.

Two complementary mechanisms, both riding ICI:

- **pjit sharding (default)**: the single-chip train step is jit'd with the
  batch sharded over the 'data' axis and the state replicated; XLA inserts
  the gradient all-reduces.  Because the BN batch statistics are computed on
  the *global* logical tensor, this gives sync-BN semantics for free — the
  classic DP pitfall (SURVEY.md section 7, hard parts) never appears.
- **shard_map + explicit psum** (``make_dp_train_step(..., explicit=True)``):
  per-device step with ``lax.pmean`` on gradients/metrics/BN stats — useful
  when per-device batch stats (torch DDP semantics) are wanted, and the
  faithful analogue of gradient all-reduce in NCCL-based frameworks.

The per-device latent/noise PRNG is decorrelated by folding the 'data' axis
index into the step key (make_train_step does this when axis_name is set).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.step import make_eval_step, make_train_step
from vaeunet_tpu.parallel.mesh import make_mesh

log = logging.getLogger(__name__)


def make_dp_train_step(config: TrainConfig, mesh: Mesh, model=None,
                       explicit: bool = False, augment: bool = False):
    """-> step(state, images, masks, beta) with batch sharded over 'data'."""
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    if not explicit:
        step = make_train_step(config, model=model, augment=augment, jit=False)
        return jax.jit(step, in_shardings=(rep, bsh, bsh, rep),
                       out_shardings=None, donate_argnums=(0,))

    inner = make_train_step(config, model=model, axis_name="data",
                            augment=augment, jit=False)
    aux_spec = {"loss": P(), "recon_loss": P(), "kl_loss": P(),
                "mu": P("data"), "logvar": P("data")}
    sharded = shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), aux_spec),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_eval_step(config: TrainConfig, mesh: Mesh, model=None):
    """-> step(variables, images, masks, rng, valid); batch + per-sample
    validity mask sharded over 'data'."""
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    step = make_eval_step(config, model=model, jit=False)
    return jax.jit(step, in_shardings=(rep, bsh, bsh, rep, bsh))


def train_model_dp(config: TrainConfig,
                   variables: Optional[Dict[str, Any]] = None,
                   mesh: Optional[Mesh] = None, **kwargs):
    """Data-parallel ``train_model``: same control flow, sharded steps.
    The global (effective) batch must divide by the 'data' axis size."""
    from vaeunet_tpu.parallel.mesh import shard_batch
    from vaeunet_tpu.training.loop import train_model

    mesh = mesh or make_mesh(config.num_devices)
    n_data = mesh.shape["data"]
    eff = config.batch_size * max(1, config.gradient_accumulation_steps)
    if eff % n_data:
        raise ValueError(
            f"effective batch {eff} not divisible by data axis {n_data}")
    log.info("Data-parallel training over mesh %s", dict(mesh.shape))

    train_step = make_dp_train_step(config, mesh, augment=True)
    eval_step = make_dp_eval_step(config, mesh)

    def place(images, masks):
        return shard_batch(mesh, images, masks)

    return train_model(config, variables=variables, train_step=train_step,
                       eval_step=eval_step, place_batch=place, **kwargs)
