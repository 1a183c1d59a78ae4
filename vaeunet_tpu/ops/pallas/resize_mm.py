"""Bilinear resize as blocked in-VMEM interp-matrix matmuls (Pallas, TPU).

The XLA lowering of ``resize_bilinear`` is a dense [out, in] einsum per
axis (ops/resize.py).  Compiled end-to-end, XLA materializes the tall
H-resized intermediate in HBM and inserts pure layout copies between the
two contractions and their conv neighbours — HLO showed 268 MB
intermediates + 1.4 GB/step of copies (RESULTS.md round 2).  These kernels
do the same math reading each operand tile straight from its native NHWC
layout into VMEM, so no relayout copies exist to insert.

Mosaic constraint that shapes the design: in-kernel reshapes that merge a
sublane dim into the lane dim are unsupported ("unsupported shape cast"),
and matmuls must be 2-D.  So all collapsing happens OUTSIDE the kernel as
free XLA bitcasts (contiguous row-major merges):

- ``resize_h``: view x as [B, H, W*C] (trailing merge, free); grid over
  (batch, W*C tiles); each cell is one 2-D MXU matmul
  ``y = m[OH, H] @ x[H, t]``.  The H-contraction is independent of the
  trailing index, so tiles may cross W boundaries.
- ``resize_w``: view x as [B*H, W, C] (leading merge, free); grid over
  row blocks; each cell contracts W: ``y = m[OW, W] @ x[W, C]`` with an
  in-kernel unrolled loop over the rows of the block (2-D dots only).

Both are linear in x, so the VJP is the same kernel with the transposed
interp matrix (a downsample): ``resize_h_op``/``resize_w_op`` wrap the
kernels in ``jax.custom_vjp``.

Equivalent reference operation: F.interpolate(..., 'bilinear')
(unet_resnet.py:79,221,238).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (keeps blocks aligned)."""
    t = max(1, min(n, target))
    while n % t:
        t -= 1
    return t


def _mm_kernel(m_ref, x_ref, y_ref):
    # x: [K, T] -> y: [O, T];  y = m @ x, one 2-D MXU matmul.
    y_ref[:] = jnp.dot(m_ref[:], x_ref[:],
                       preferred_element_type=jnp.float32).astype(y_ref.dtype)


def _rows_kernel(m_ref, x_ref, y_ref):
    # x: [R, W, C] -> y: [R, OW, C];  per-row 2-D dots (unrolled, R small).
    for r in range(x_ref.shape[0]):
        y_ref[r] = jnp.dot(m_ref[:], x_ref[r],
                           preferred_element_type=jnp.float32
                           ).astype(y_ref.dtype)


# VMEM working-set budget per pallas_call (bytes).  ~16 MB VMEM minus
# double-buffering of in+out blocks and the resident interp matrix.
_VMEM_BUDGET = 4 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(2, 3))
def resize_h(x: jnp.ndarray, m: jnp.ndarray, out_size: int,
             interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C]; m: [out_size, H] -> [B, out_size, W, C]."""
    b, h, w, c = x.shape
    oh = out_size
    wc = w * c
    x2 = x.reshape(b, h, wc)                      # free: trailing merge
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    budget = _VMEM_BUDGET // (2 * (h + oh) * itemsize)
    t = _tile(wc, max(128, (budget // 128) * 128))
    y = pl.pallas_call(
        _mm_kernel,
        grid=(b, wc // t),
        in_specs=[
            pl.BlockSpec((oh, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, oh, t), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, wc), x.dtype),
        interpret=interpret,
    )(m.astype(x.dtype), x2)
    return y.reshape(b, oh, w, c)


@functools.partial(jax.jit, static_argnums=(2, 3))
def resize_w(x: jnp.ndarray, m: jnp.ndarray, out_size: int,
             interpret: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C]; m: [out_size, W] -> [B, H, out_size, C]."""
    b, h, w, c = x.shape
    ow = out_size
    bh = b * h
    x2 = x.reshape(bh, w, c)                      # free: leading merge
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    budget = _VMEM_BUDGET // (2 * (w + ow) * c * itemsize)
    r = _tile(bh, max(1, min(8, budget)))
    y = pl.pallas_call(
        _rows_kernel,
        grid=(bh // r,),
        in_specs=[
            pl.BlockSpec((ow, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, ow, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, ow, c), x.dtype),
        interpret=interpret,
    )(m.astype(x.dtype), x2)
    return y.reshape(b, h, ow, c)


def _make_op(kernel_fn):
    """Wrap a resize kernel in custom_vjp: VJP of ``y = M x`` is ``Mᵀ g``,
    i.e. the same kernel with the transposed (downsampling) matrix."""

    def _interp() -> bool:
        # pallas TPU kernels need interpret mode on any other backend
        return jax.default_backend() != "tpu"

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def op(x, m, mt, out_size):
        return kernel_fn(x, m, out_size, _interp())

    def fwd(x, m, mt, out_size):
        return kernel_fn(x, m, out_size, _interp()), (m, mt)

    def bwd(out_size, res, g):
        m, mt = res
        axis_in = mt.shape[0]
        gx = kernel_fn(g, mt, axis_in, _interp())
        return gx, None, None

    op.defvjp(fwd, bwd)
    return op


resize_h_op = _make_op(resize_h)
resize_w_op = _make_op(resize_w)
