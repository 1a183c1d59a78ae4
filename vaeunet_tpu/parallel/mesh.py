"""Device mesh construction and batch sharding.

The reference has no distributed machinery at all (SURVEY.md section 2.2);
this module supplies the TPU-native scale-out path: a ``jax.sharding.Mesh``
over ICI with named axes

  'data'   — batch-dimension sharding (DP); gradients psum over this axis
  'model'  — optional channel sharding of the widest conv layers (TP)

Collectives ride ICI automatically once shardings are annotated; no
NCCL-style transport code exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1D data mesh by default; 2D (data, model) when model_axis > 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    devices = devices[:n]
    assert n % model_axis == 0
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches shard along the batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays onto the mesh, batch-sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
