"""Unified checkpoint loading for all CLIs.

Accepts either a reference ``.pth`` file (train.py:542-565 format or a bare
state_dict) or a vaeunet_tpu orbax run directory, reconstructs the model
from the stored hyperparameters, and returns (model, variables, config).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vaeunet_tpu.training.config import TrainConfig

log = logging.getLogger(__name__)


def load_model_and_variables(path: str,
                             overrides: Optional[Dict[str, Any]] = None
                             ) -> Tuple[Any, Dict, TrainConfig]:
    """-> (model, variables, config).

    The checkpoint's own metadata wins (state-dict keys / stored params for
    .pth, config.json for orbax runs); `overrides` act as fallbacks for
    fields the checkpoint does not record (e.g. CLI --latent-injection on a
    bare state_dict)."""
    from vaeunet_tpu.training.state import build_model

    if str(path).endswith(".pth"):
        from vaeunet_tpu.compat.torch_weights import load_reference_checkpoint
        variables, meta = load_reference_checkpoint(path)
        variables = jax.tree.map(jnp.asarray, variables)
        cfg_kwargs = {}
        if meta:
            mapping = {"lesion_type": "lesion_type", "patch_size": "patch_size",
                       "img_scale": "img_scale", "beta": "beta",
                       "free_bits": "free_bits",
                       "kl_anneal_epochs": "kl_anneal_epochs",
                       "latent_injection": "latent_injection",
                       "use_attention": "use_attention", "seed": "seed"}
            for src, dst in mapping.items():
                if meta.get(src) is not None:
                    cfg_kwargs[dst] = meta[src]
            if meta.get("model_type"):
                cfg_kwargs["model_type"] = (
                    "resnet" if meta["model_type"] == "resnet" else "basic")
        is_resnet = any(k.startswith("encoder")
                        for k in variables.get("params", {}))
        cfg_kwargs.setdefault("model_type", "resnet" if is_resnet else "basic")
        config = TrainConfig(**{**(overrides or {}), **cfg_kwargs})
        model = build_model(config)
        log.info("Loaded reference checkpoint %s (%s)", path,
                 config.model_type)
        return model, variables, config

    from vaeunet_tpu.training.checkpoint import load_config, restore_checkpoint
    from vaeunet_tpu.training.state import create_train_state

    config = load_config(path)
    if config is None:
        config = TrainConfig(**(overrides or {}))
    template = create_train_state(config, jax.random.PRNGKey(0))
    restored, _ = restore_checkpoint(path, template)
    model = build_model(config)
    log.info("Loaded orbax checkpoint %s (%s)", path, config.model_type)
    return model, restored.variables(), config
