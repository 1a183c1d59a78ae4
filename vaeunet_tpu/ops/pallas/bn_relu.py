"""Fused inference BatchNorm + ReLU as a Pallas VPU kernel.

y = max(0, (x - mean) * rsqrt(var + eps) * scale + bias)

The affine part folds to a single multiply-add with precomputed
``a = scale * rsqrt(var + eps)`` and ``b = bias - mean * a``; the kernel
streams NHWC tiles through VMEM applying ``max(x*a + b, 0)`` per channel.

XLA usually fuses BN+ReLU into the producing convolution's epilogue on its
own, so this kernel is benchmarked against the lax baseline and used only
where it wins (SURVEY.md section 7-6); it also serves as the template for
later fused epilogues.  Grid: rows of the flattened [N*H*W, C] view.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bn_relu_kernel(x_ref, a_ref, b_ref, y_ref):
    y_ref[:] = jnp.maximum(x_ref[:] * a_ref[:] + b_ref[:], 0.0)


@functools.partial(jax.jit, static_argnums=(5,))
def fused_bn_relu(x: jnp.ndarray, scale, bias, mean, var,
                  interpret: bool = False, eps: float = 1e-5) -> jnp.ndarray:
    """x: [..., C] float; folded-affine BN (running stats) + ReLU."""
    c = x.shape[-1]
    orig_shape = x.shape
    orig_dtype = x.dtype
    a = (scale * jax.lax.rsqrt(var.astype(jnp.float32) + eps)).astype(jnp.float32)
    b = (bias - mean * a).astype(jnp.float32)

    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, c).astype(jnp.float32)

    # row-tile the flattened view; channels stay whole (last dim = lanes)
    tile = min(rows, 512)
    n_tiles = -(-rows // tile)
    pad = n_tiles * tile - rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    y = pl.pallas_call(
        _bn_relu_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, c), jnp.float32),
        interpret=interpret,
    )(x2, a.reshape(1, c), b.reshape(1, c))
    if pad:
        y = y[:rows]
    return y.reshape(orig_shape).astype(orig_dtype)
