"""Functional train state: params + batch_stats + optimizer + PRNG + step.

The reference mutates a torch module/optimizer in place (train.py:323-343);
here everything lives in one immutable PyTree so a single jit'd step (and its
shard_map data-parallel variant) can own the whole update.

Optimizer matches train.py:323-342: AdamW(lr, weight_decay=1e-5) behind
global-norm clipping (train.py:408).  The learning rate is an
``optax.inject_hyperparams`` hyperparameter so the host-side
ReduceLROnPlateau controller can rescale it between steps without
recompiling (see vaeunet_tpu.training.schedule).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from vaeunet_tpu.models.unet import UNet
from vaeunet_tpu.models.vae_unet import UNetResNet
from vaeunet_tpu.training.config import TrainConfig


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.gradient_clipping),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=config.learning_rate,
            b1=0.9, b2=0.999, eps=1e-8,              # torch AdamW defaults
            weight_decay=config.weight_decay,
        ),
    )


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state[1].hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    inner = state.opt_state[1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_inner = inner._replace(hyperparams=hp)
    return state.replace(opt_state=(state.opt_state[0], new_inner))


def build_model(config: TrainConfig):
    """Model factory mirroring the reference's CLI dispatch (train.py:680-695).

    Unlike the reference — whose training loop unconditionally unpacks
    (seg, mu, logvar) and therefore cannot actually train the 'basic' model
    (SURVEY.md section 2.4-1) — both types train here.
    """
    if config.model_type == "resnet":
        return UNetResNet(
            n_channels=config.n_channels,
            n_classes=config.n_classes,
            backbone=config.backbone,
            latent_dim=config.latent_dim,
            use_attention=config.use_attention,
            use_skip=config.use_skip,
            latent_injection=config.latent_injection,
            use_remat=config.use_remat,
            remat_policy=config.remat_policy,
            deep_supervision=config.deep_supervision,
        )
    return UNet(n_channels=config.n_channels, n_classes=config.n_classes,
                bilinear=config.bilinear, use_remat=config.use_remat)


def create_train_state(config: TrainConfig, rng: jax.Array,
                       sample_input_hw: Optional[tuple] = None,
                       variables: Optional[Dict[str, Any]] = None) -> TrainState:
    """Initialize (or adopt converted) variables and wrap them in a state."""
    model = build_model(config)
    if variables is None:
        hw = sample_input_hw or (config.patch_size or 256, config.patch_size or 256)
        init_rng, rng = jax.random.split(rng)

        # jit the whole init: on the tunneled TPU backend, eager per-param
        # initialization costs ~30ms/op and takes minutes for this model.
        @jax.jit
        def init_fn(key):
            dummy = jnp.zeros((1, hw[0], hw[1], config.n_channels), jnp.float32)
            rngs = {"params": key, "latent": jax.random.fold_in(key, 1)}
            if isinstance(model, UNetResNet):
                return model.init(rngs, dummy, train=False, sample=False)
            return model.init(rngs, dummy, train=False)

        variables = init_fn(init_rng)
    variables = dict(variables)
    tx = make_optimizer(config)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=jax.jit(tx.init)(params),
        rng=rng,
    )
