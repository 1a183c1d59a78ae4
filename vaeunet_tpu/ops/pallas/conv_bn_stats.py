"""Fused 3x3 conv + BatchNorm-statistics epilogue (Pallas, TPU).

Training-mode BatchNorm needs per-channel sum and sum-of-squares of the
convolution output. XLA computes them as a separate fusion that re-reads
the full activation from HBM — profiled at ~30% of the train-step time on
the VAE-UNet (RESULTS.md round 1). This kernel accumulates both moments in
the conv's epilogue while the output tile is still in VMEM, saving that
full-tensor read (reference counterpart: cuDNN fused conv+BN, SURVEY.md
section 2 native table).

Forward-only fusion: the backward pass reuses the standard XLA convolution
VJP (conv_general_dilated on the transposed/rotated kernel), plus the exact
moment gradients (d sum = 1, d sumsq = 2y), via jax.custom_vjp.

Layout: NHWC x [B,H,W,Ci] (pre-padded by 1), HWIO kernel [3,3,Ci,Co];
grid over (batch, row-tiles); each step does 9 shifted [TH*W, Ci]x[Ci, Co]
MXU dots and writes one output tile + one partial-moment row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, k_ref, y_ref, s_ref, q_ref, *, th, w, ci, co, out_dtype):
    """x_ref: [1, th+2, w+2, ci] (padded tile), k_ref: [3, 3, ci, co],
    y_ref: [1, th, w, co], s_ref/q_ref: [8, co] moment accumulators.

    The moment outputs use a constant block index, so on TPU's sequential
    grid they live in VMEM for the whole sweep and are written back once at
    the end — the accumulate-in-revisited-block pattern. An (8, co) block
    (not (1, co)) satisfies the sublane tiling constraint; only row 0 holds
    data.
    """
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        s_ref[...] = jnp.zeros((8, co), jnp.float32)
        q_ref[...] = jnp.zeros((8, co), jnp.float32)

    acc = jnp.zeros((th, w, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = x_ref[0, ky:ky + th, kx:kx + w, :]        # [th, w, ci]
            acc = acc + lax.dot_general(
                patch, k_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y_ref[0, :] = acc.astype(out_dtype)
    row0 = lax.broadcasted_iota(jnp.int32, (8, co), 0) == 0
    s_ref[...] += jnp.where(row0, jnp.sum(acc, axis=(0, 1))[None, :], 0.0)
    q_ref[...] += jnp.where(row0, jnp.sum(acc * acc, axis=(0, 1))[None, :],
                            0.0)


def _conv3x3_stats_fwd(x, kernel, out_dtype, th, interpret):
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    n_th = -(-h // th)
    hp = n_th * th
    xp = jnp.pad(x, ((0, 0), (1, 1 + hp - h), (1, 1), (0, 0)))

    y, s, q = pl.pallas_call(
        functools.partial(_kernel, th=th, w=w, ci=ci, co=co,
                          out_dtype=out_dtype),
        grid=(b, n_th),
        in_specs=[
            # row tiles overlap by the 2-row halo: element-granular indexing
            # (hardware lowering requires all dims Element or none)
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2),
                          pl.Element(w + 2), pl.Element(ci)),
                         lambda i, j: (i, j * th, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci, co), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, w, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hp, w, co), out_dtype),
            jax.ShapeDtypeStruct((8, co), jnp.float32),
            jax.ShapeDtypeStruct((8, co), jnp.float32),
        ),
        interpret=interpret,
    )(xp, kernel)
    y = y[:, :h]
    # Padded rows contribute zero to the moments only when hp == h; with
    # row padding the pad region convolves real pixels (bottom halo), so
    # recompute from the valid output instead of branching in-kernel.
    if hp != h:
        tail = y.astype(jnp.float32)  # full valid output
        s_fix = jnp.sum(tail.reshape(-1, co), axis=0)
        q_fix = jnp.sum(jnp.square(tail).reshape(-1, co), axis=0)
        return y, s_fix, q_fix
    return y, s[0], q[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3_bn_stats(x, kernel, out_dtype=jnp.float32, th: int = 8,
                     interpret: bool = False):
    """3x3 pad-1 stride-1 NHWC conv returning (y, sum_c, sumsq_c).

    sum/sumsq are fp32 per-channel moments of y over (N, H, W) — exactly
    what training BatchNorm consumes (ops/layers.py BatchNorm).
    """
    return _conv3x3_stats_fwd(x, kernel, out_dtype, th, interpret)


def _fwd(x, kernel, out_dtype, th, interpret):
    y, s, q = _conv3x3_stats_fwd(x, kernel, out_dtype, th, interpret)
    return (y, s, q), (x, kernel, y)


def _bwd(out_dtype, th, interpret, res, cts):
    x, kernel, y = res
    gy, gs, gq = cts
    # moment gradients fold into the output cotangent: d sum/dy = 1,
    # d sumsq/dy = 2y  (per channel)
    g = gy.astype(jnp.float32) + gs[None, None, None, :] \
        + 2.0 * y.astype(jnp.float32) * gq[None, None, None, :]
    g = g.astype(x.dtype)
    # standard conv VJPs via XLA
    dx = lax.conv_general_dilated(
        g, jnp.rot90(kernel, 2, axes=(0, 1)).transpose(0, 1, 3, 2),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dk = lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),          # CiHWB as "N"HW"C"
        g.transpose(1, 2, 0, 3),          # HWBCo as HWIO
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3)               # -> [3,3,Ci,Co]
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv3x3_bn_stats.defvjp(_fwd, _bwd)
