"""Bilinear / nearest resize with exact PyTorch semantics, NHWC layout.

The reference uses ``F.interpolate(..., mode='bilinear', align_corners=True)``
throughout its model code (reference unet/unet_parts.py:73, unet/unet_resnet.py:79,
unet_resnet.py:221,238) and ``align_corners=False`` + ``mode='nearest'`` in its
data pipeline (utils/data_loading.py:518-529).  ``jax.image.resize`` implements
neither coordinate convention, so bit-parity of the fp32 predict path requires
these hand-rolled kernels.

All functions take NHWC (or HWC / NHW...C — anything with H, W as the -3/-2
axes) and static output sizes, so they trace to fixed-shape XLA gathers that
fuse with surrounding elementwise work.

Accumulation order matches PyTorch's CPU/CUDA upsample kernels: the W axis is
blended innermost, then H, i.e. ``h0l*(w0l*v00 + w1l*v01) + h1l*(...)`` — this
keeps fp32 rounding identical to the reference implementation.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# A/B switch for the exact-2x banded lowering ("1" forces it on).  Default
# OFF: measured end-to-end on the 512^2 b16 train step (scripts/ab_step.py,
# donated-state, order-independent), the interp-matrix contraction wins —
# mm 234 img/s vs band-stack 199 vs band-pad 144.  The band's parity
# interleave (stack+reshape OR dilated-pad+add) always materializes
# relayout copies the dot_general path avoids entirely; the HLO copy count
# it was built to remove is cheaper than the fusions it breaks.
_BAND2X = os.environ.get("VAEUNET_RESIZE_BAND2X", "0") == "1"
# Interleave lowering for the banded 2x path: "pad" emits the parity merge
# as interior-dilated pads + add, "stack" (default) as stack+reshape.
# Measured: pad is WORSE end-to-end (144 vs 199 img/s) — the pad pair
# defeats the TPU loop-fusion emitter on both sides.  Kept for A/B.
_BAND2X_PAD = os.environ.get("VAEUNET_BAND2X_INTERLEAVE", "stack") == "pad"
# H-pass contraction emission: "einsum" (default) asks for the bowc output
# directly; "bwoc" emits the dot with the natural [b,w,o,c] output order and
# a separate swapaxes, probing whether XLA folds the explicit transpose into
# neighbours more cheaply than the dot-internal relayout it otherwise
# inserts (the largest remaining copy family per scripts/profile_step.py).
_HMODE = os.environ.get("VAEUNET_RESIZE_HMODE", "einsum")
# Exact-2x gather-lerp lowering: "" (off, default), "h" (H axis only),
# "hw" (both spatial axes).  Forward = two row-gathers + a weighted blend
# that writes output rows in NATURAL order (no parity interleave — the
# relayout that sank the band2x attempt), backward = the banded transpose
# as 3 strided slices + weighted add (no scatter — what sank the original
# gather-lerp).  MEASURED END-TO-END (round 3, scripts/ab_step.py): h-only
# 221.6 img/s, hw 178.3 vs the mm default's 235.8 — the row-gathers
# re-tile the sublane axis anyway and the VPU blend costs more than the
# relayout copies it removes, so the dot_general form stays the default
# (see RESULTS.md "irreducible under current XLA").
_GATHER2X = os.environ.get("VAEUNET_RESIZE_GATHER2X", "")


def _source_coords(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Source coordinates in float32, matching PyTorch's vectorized CPU
    upsample kernels.  Static — sizes are Python ints at trace time, so the
    index/weight tables are baked into the graph as constants (no runtime
    iota/divide work on device).

    Residual difference vs torch is <=2 ulp (torch's SIMD kernel uses FMA in
    the blend); parity of the *thresholded* predict mask — the BASELINE
    bit-for-bit criterion — is unaffected.
    """
    if align_corners:
        if out_size == 1:
            return np.zeros((1,), dtype=np.float32)
        scale = np.float32(in_size - 1) / np.float32(out_size - 1)
        return np.arange(out_size, dtype=np.float32) * scale
    scale = np.float32(in_size) / np.float32(out_size)
    coords = (np.arange(out_size, dtype=np.float32) + np.float32(0.5)) * scale - np.float32(0.5)
    return np.maximum(coords, np.float32(0.0))


def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic linear-interp matrix (2 nonzeros per row)."""
    coords = _source_coords(in_size, out_size, align_corners)
    i0 = np.clip(np.floor(coords).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = (coords - i0).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - lam)
    np.add.at(m, (rows, i1), lam)
    return m


def _mm_apply(x: jnp.ndarray, axis: int, m: jnp.ndarray) -> jnp.ndarray:
    """Contract `x`'s `axis` (size = m.shape[1]) with interp matrix
    ``m [out, in]``, producing size m.shape[0] on that axis."""
    if axis == x.ndim - 2:          # W of [..., H, W, C]
        return jnp.einsum("ow,...wc->...oc", m, x)
    if axis == x.ndim - 3:          # H of [..., H, W, C]
        if _HMODE == "bwoc":
            y = jnp.einsum("oh,...hwc->...woc", m, x)
            return jnp.swapaxes(y, -3, -2)
        return jnp.einsum("oh,...hwc->...owc", m, x)
    xm = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", xm, m)
    return jnp.moveaxis(y, -1, axis)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _mm_blend(x: jnp.ndarray, axis: int, in_size: int, out_size: int,
              align_corners: bool) -> jnp.ndarray:
    """Interp-matrix lowering of the linear blend with a hand-written VJP.

    XLA's automatic transpose of the forward dot_general picks a hostile
    output layout on TPU (``...->b1f0``), inserting full-activation relayout
    copies in the backward pass (~2.7 GB/step measured across the decoder
    resizes).  The cotangent of ``y = M x`` is ``M^T g`` — structurally the
    SAME contraction with the transposed (i.e. out_size->in_size resize)
    matrix — so expressing it as a fresh forward-form einsum keeps both
    directions in native layouts.
    """
    m = jnp.asarray(_interp_matrix(in_size, out_size, align_corners),
                    dtype=x.dtype)
    return _mm_apply(x, axis, m)


def _mm_blend_fwd(x, axis, in_size, out_size, align_corners):
    return _mm_blend(x, axis, in_size, out_size, align_corners), None


def _mm_blend_bwd(axis, in_size, out_size, align_corners, _res, g):
    mt = jnp.asarray(
        _interp_matrix(in_size, out_size, align_corners).T.copy(),
        dtype=g.dtype)
    return (_mm_apply(g, axis, mt),)


_mm_blend.defvjp(_mm_blend_fwd, _mm_blend_bwd)


def _band_weights_up2(in_size: int, align_corners: bool):
    """Per-parity 3-tap band weights for the exact-2x linear upsample.

    For both coordinate conventions the [2H, H] interp matrix restricted to
    one output parity p is 3-banded: row k draws only on columns k-1..k+1
    (verified by construction below).  Returns w[p] of shape [3, H] with
    ``out[2k+p] = sum_d w[p][d+1, k] * x[k+d]`` (zero outside the range).
    """
    m = _interp_matrix(in_size, 2 * in_size, align_corners)
    ws = []
    for p in (0, 1):
        rows = m[p::2]                       # [H, H]
        w = np.zeros((3, in_size), np.float32)
        for d in (-1, 0, 1):
            diag = np.diagonal(rows, offset=d)
            if d >= 0:
                w[d + 1, : in_size - d] = diag
            else:
                w[d + 1, -d:] = diag
        if not np.allclose(w.sum(0), rows.sum(1)):
            raise AssertionError("2x interp matrix is not 3-banded")
        ws.append(w)
    return ws


def _axis_vec(v: np.ndarray, x_ndim: int, axis: int, dtype) -> jnp.ndarray:
    shape = [1] * x_ndim
    shape[axis] = v.shape[0]
    return jnp.asarray(v.reshape(shape), dtype=dtype)


def _shift(x: jnp.ndarray, axis: int, e: int) -> jnp.ndarray:
    """result[k] = x[k+e] along `axis`, zero-padded out of range."""
    if e == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(0, -e), max(0, e))
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(max(0, e), max(0, e) + n)
    return jnp.pad(x, pad)[tuple(sl)]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _band_blend_up2(x: jnp.ndarray, axis: int, in_size: int,
                    align_corners: bool) -> jnp.ndarray:
    """Exact-2x linear upsample as shifted elementwise blends + interleave.

    Equivalent to ``_mm_blend(x, axis, in_size, 2*in_size, ...)`` lowered as
    VPU work.  NOT the default: end-to-end A/B (scripts/ab_step.py) showed
    the parity interleave itself becomes the relayout copy (the stacked
    [..., H, 2, ...] tensor is materialized then re-laid-out; ~1.4 GB/step)
    and the step runs 15% slower than the dot_general form, whose custom
    VJP (``_mm_blend``) already avoids the backward-pass copies this kernel
    was built to kill.  Kept behind VAEUNET_RESIZE_BAND2X=1 for re-testing
    on future toolchains.  The VJP is the transposed band — again shifted
    elementwise blends.
    """
    w0, w1 = _band_weights_up2(in_size, align_corners)
    parts = []
    for w in (w0, w1):
        acc = None
        for d in (-1, 0, 1):
            term = _axis_vec(w[d + 1], x.ndim, axis, x.dtype) * _shift(x, axis, d)
            acc = term if acc is None else acc + term
        parts.append(acc)
    if _BAND2X_PAD:
        # Parity merge as interior-dilated pads + add: even outputs from
        # parts[0], odd from parts[1].  Unlike stack+reshape, pad is an
        # elementwise-addressable producer the TPU fusion emitters inline
        # into the consumer (no materialized [..., H, 2, ...] intermediate).
        zero = jnp.zeros((), x.dtype)
        cfg_e = [(0, 0, 0)] * x.ndim
        cfg_e[axis] = (0, 1, 1)              # a -> indices 0,2,...,2H-2
        cfg_o = [(0, 0, 0)] * x.ndim
        cfg_o[axis] = (1, 0, 1)              # b -> indices 1,3,...,2H-1
        return lax.pad(parts[0], zero, cfg_e) + lax.pad(parts[1], zero, cfg_o)
    y = jnp.stack(parts, axis=axis + 1)      # [..., H, 2, ...]
    shape = list(x.shape)
    shape[axis] = 2 * in_size
    return y.reshape(shape)


def _band_blend_up2_fwd(x, axis, in_size, align_corners):
    return _band_blend_up2(x, axis, in_size, align_corners), None


def _band_blend_up2_bwd(axis, in_size, align_corners, _res, g):
    # dx[k] = sum_{p, e in {-1,0,1}} w[p][1-e, k+e] * g[2(k+e)+p]
    ws = _band_weights_up2(in_size, align_corners)
    if _BAND2X_PAD:
        # parity extraction as strided slices (the transpose of the
        # interior-dilated pads in forward) — fuses, no reshape relayout
        sl = [slice(None)] * g.ndim
        parities = []
        for p in (0, 1):
            sl[axis] = slice(p, 2 * in_size, 2)
            parities.append(g[tuple(sl)])    # [..., H, ...]
    else:
        shape = list(g.shape)
        shape[axis : axis + 1] = [in_size, 2]
        gp = g.reshape(shape)                # [..., H, 2, ...]
        sl = [slice(None)] * gp.ndim
        parities = []
        for p in (0, 1):
            sl[axis + 1] = p
            parities.append(gp[tuple(sl)])   # [..., H, ...]
    dx = None
    for p in (0, 1):
        gpp = parities[p]
        for e in (-1, 0, 1):
            w = _axis_vec(ws[p][1 - e], gpp.ndim, axis, g.dtype)
            term = _shift(w * gpp, axis, e)
            dx = term if dx is None else dx + term
    return (dx,)


_band_blend_up2.defvjp(_band_blend_up2_fwd, _band_blend_up2_bwd)


def _lerp_apply(x: jnp.ndarray, axis: int, in_size: int, out_size: int,
                align_corners: bool) -> jnp.ndarray:
    """Gather + ``(1-lam)*lo + lam*hi`` product-form linear interp (the
    PyTorch upsample formulation).  Output rows land in natural order."""
    coords = _source_coords(in_size, out_size, align_corners)
    i0 = np.clip(np.floor(coords).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = jnp.asarray((coords - i0).astype(np.float32), dtype=x.dtype)

    shape = [1] * x.ndim
    shape[axis] = out_size
    lam = lam.reshape(shape)

    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    return (1.0 - lam) * lo + lam * hi


def _transpose_band_weights_up2(in_size: int, align_corners: bool):
    """Per-offset weights of the TRANSPOSED exact-2x interp matrix.

    ``M [2H, H]`` for a 2x linear upsample feeds input row k into at most
    the three output rows ``2k + e, e in {0, 1, 2}`` (both coordinate
    conventions; verified by reconstruction below), so the cotangent is
    ``dx[k] = sum_e w[e][k] * g[2k + e]`` — strided slices + weighted adds,
    never a scatter.  Returns ``[(e, w_e)]`` for the live offsets.
    """
    m = _interp_matrix(in_size, 2 * in_size, align_corners)
    mt = m.T                                     # [H, 2H]
    recon = np.zeros_like(mt)
    out = []
    for e in range(-2, 4):
        w = np.zeros(in_size, np.float32)
        for k in range(in_size):
            c = 2 * k + e
            if 0 <= c < 2 * in_size:
                w[k] = mt[k, c]
                recon[k, c] = mt[k, c]
        if np.any(w):
            out.append((e, w))
    if not np.allclose(recon, mt):
        raise AssertionError("2x interp transpose is not 3-banded")
    return out


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _gather_blend_up2(x: jnp.ndarray, axis: int, in_size: int,
                      align_corners: bool) -> jnp.ndarray:
    """Exact-2x linear upsample, gather-lerp forward + banded-slice VJP.

    Enabled per-axis by VAEUNET_RESIZE_GATHER2X (see the flag note at the
    top).  Semantics identical to ``_mm_blend(x, axis, in, 2*in, ac)``.
    """
    return _lerp_apply(x, axis, in_size, 2 * in_size, align_corners)


def _gather_blend_up2_fwd(x, axis, in_size, align_corners):
    return _gather_blend_up2(x, axis, in_size, align_corners), None


def _gather_blend_up2_bwd(axis, in_size, align_corners, _res, g):
    # dx[k] = sum_e w_e[k] * g[2k + e]; pad once so every strided slice is
    # in range, then let XLA fuse the slices into the weighted-add loop.
    bands = _transpose_band_weights_up2(in_size, align_corners)
    lo_pad = max(0, -min(e for e, _ in bands))
    hi_pad = max(0, max(e for e, _ in bands) + 2 * (in_size - 1)
                 - (2 * in_size - 1))
    pad = [(0, 0)] * g.ndim
    pad[axis] = (lo_pad, hi_pad)
    gp = jnp.pad(g, pad) if (lo_pad or hi_pad) else g
    dx = None
    for e, w in bands:
        sl = [slice(None)] * g.ndim
        start = e + lo_pad
        sl[axis] = slice(start, start + 2 * in_size - 1, 2)
        term = _axis_vec(w, g.ndim, axis, g.dtype) * gp[tuple(sl)]
        dx = term if dx is None else dx + term
    return (dx,)


_gather_blend_up2.defvjp(_gather_blend_up2_fwd, _gather_blend_up2_bwd)


def _gather_blend(x: jnp.ndarray, axis: int, in_size: int, out_size: int,
                  align_corners: bool) -> jnp.ndarray:
    """Linear interpolation of `x` along `axis` to `out_size`.

    Two lowerings with identical math:
    - **TPU**: a dense [out, in] interp-matrix contraction — MXU work whose
      VJP is another matmul (see `_mm_blend`).  The gather lowering costs
      2-3x more forward and far more backward (scatter); measured 1.5-2x
      end-to-end win on the decoder resizes.
    - **elsewhere (parity path)**: gathers + the exact
      ``(1-lam)*lo + lam*hi`` product form of PyTorch's upsample kernels,
      keeping CPU fp32 results bit-compatible with the reference.
    """
    if in_size == out_size:
        return x
    if jax.default_backend() == "tpu":
        if out_size == 2 * in_size and axis >= x.ndim - 3:
            if _BAND2X:
                return _band_blend_up2(x, axis, in_size, align_corners)
            is_h = axis == x.ndim - 3
            if (_GATHER2X == "hw" and axis >= x.ndim - 3) or \
                    (_GATHER2X == "h" and is_h):
                return _gather_blend_up2(x, axis, in_size, align_corners)
        return _mm_blend(x, axis, in_size, out_size, align_corners)

    coords = _source_coords(in_size, out_size, align_corners)
    i0 = np.clip(np.floor(coords).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = jnp.asarray((coords - i0).astype(np.float32), dtype=x.dtype)

    shape = [1] * x.ndim
    shape[axis] = out_size
    lam = lam.reshape(shape)

    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    return (1.0 - lam) * lo + lam * hi


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize along the (-3, -2) axes (H, W of an NHWC tensor).

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` exactly for
    both align_corners conventions.  W is blended before H so the fp32
    accumulation order matches PyTorch's kernels.
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]
    if jax.default_backend() == "tpu" and oh >= h and ow >= w:
        # Upsampling on the MXU path: run the H contraction FIRST, while W
        # is still small.  The H-axis dot needs a relayout of its operand
        # (H is not a contractible minor dim in NHWC); doing it before the
        # W pass widens the tensor halves the transposed bytes.  Separable
        # passes commute exactly in exact arithmetic; the fp32 accumulation
        # -order note above applies to the CPU parity path, which keeps
        # W-first.
        x = _gather_blend(x, x.ndim - 3, h, oh, align_corners)
        x = _gather_blend(x, x.ndim - 2, w, ow, align_corners)
        return x
    x = _gather_blend(x, x.ndim - 2, w, ow, align_corners)
    x = _gather_blend(x, x.ndim - 3, h, oh, align_corners)
    return x


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize matching ``F.interpolate(mode='nearest')``:
    src = floor(dst * in/out)."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]

    def idx(in_size, out_size):
        if in_size == out_size:
            return None
        src = np.floor(
            np.arange(out_size, dtype=np.float64) * (in_size / out_size)
        ).astype(np.int32)
        return jnp.asarray(np.clip(src, 0, in_size - 1))

    iw = idx(w, ow)
    if iw is not None:
        x = jnp.take(x, iw, axis=x.ndim - 2)
    ih = idx(h, oh)
    if ih is not None:
        x = jnp.take(x, ih, axis=x.ndim - 3)
    return x


def upsample2x_bilinear_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x spatial upsample, PyTorch ``Upsample(scale_factor=2, mode='bilinear',
    align_corners=True)`` semantics (reference unet/unet_parts.py:73)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)


def broadcast_latent_spatial(z: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Broadcast a [B, D] latent to [B, H, W, D].

    The reference reshapes z to [B, D, 1, 1] and bilinear-interpolates to the
    bottleneck spatial size with align_corners=True (unet_resnet.py:217-221).
    Interpolating a 1x1 map is a pure broadcast — implemented as such here so
    XLA sees it for free instead of running a gather.
    """
    b, d = z.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    return jnp.broadcast_to(z[:, None, None, :], (b, oh, ow, d))
