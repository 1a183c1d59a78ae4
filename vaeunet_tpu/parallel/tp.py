"""Tensor parallelism for conv stacks: channel-sharded parameters.

The VAE-UNet is a convnet — its tensor-parallel axis is the channel
dimension, not attention heads.  Sharding the widest conv kernels' output
channels over the 'model' mesh axis (and letting XLA propagate: the next
conv's input-channel dim shards to match, with reduce-scatter/all-gather
inserted where the propagation breaks) splits both FLOPs and activation
memory of the 512-channel bottleneck stages.

For the reference-sized model this is optional (it fits on one chip); it is
the scaling lever for wider derivatives and is exercised by
``__graft_entry__.dryrun_multichip`` as the tp component of the dp x tp mesh.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_pspec(path: tuple, leaf, min_channels: int = 256) -> P:
    """PartitionSpec for one param leaf: shard conv-kernel output channels
    (HWIO dim 3) over 'model' when wide enough; replicate everything else."""
    names = [getattr(p, "key", str(p)) for p in path]
    if names and names[-1] == "kernel" and getattr(leaf, "ndim", 0) == 4:
        if leaf.shape[-1] >= min_channels:
            return P(None, None, None, "model")
    return P()


def param_shardings(params: Any, mesh: Mesh, min_channels: int = 256):
    """Pytree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_pspec(path, leaf, min_channels)), params)


def shard_params(params: Any, mesh: Mesh, min_channels: int = 256):
    shardings = param_shardings(params, mesh, min_channels)
    return jax.tree.map(jax.device_put, params, shardings)
