"""ctypes bindings for the native host-side data engine (host_ops.cpp).

Builds lazily with `make` on first use (g++ is in the image; pybind11 is
not, so plain C ABI + ctypes).  All entry points have pure-numpy fallbacks —
`available()` gates the fast path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libvaeunet_host.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or (_LIB_PATH.stat().st_mtime
                                      < (_DIR / "host_ops.cpp").stat().st_mtime):
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gather_patch_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.feathered_blend_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64]
        lib.resize_bilinear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        _lib = lib
        log.info("native host ops loaded from %s", _LIB_PATH)
    except Exception as e:  # compiler missing / build failure -> fallback
        log.warning("native host ops unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def gather_patch_batch(images: Sequence[np.ndarray],
                       masks: Sequence[np.ndarray],
                       coords: np.ndarray, patch: int,
                       num_threads: int = 6) -> Tuple[np.ndarray, np.ndarray]:
    """Per-patch gather: images[b] is an HWC uint8 plane, masks[b] an HW
    uint8 plane, coords [B,2] int32 (y,x) -> (float32 [B,P,P,3] in [0,1],
    float32 [B,P,P,1])."""
    lib = _load()
    b = len(images)
    coords = np.ascontiguousarray(coords, np.int32)
    out_img = np.empty((b, patch, patch, 3), np.float32)
    out_msk = np.empty((b, patch, patch), np.float32)
    if lib is None:
        for i in range(b):
            y, x = int(coords[i, 0]), int(coords[i, 1])
            out_img[i] = images[i][y:y + patch, x:x + patch].astype(np.float32) / 255.0
            out_msk[i] = (masks[i][y:y + patch, x:x + patch] > 0).astype(np.float32)
        return out_img, out_msk[..., None]

    img_ptrs = (ctypes.c_void_p * b)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    msk_ptrs = (ctypes.c_void_p * b)(
        *[m.ctypes.data_as(ctypes.c_void_p).value for m in masks])
    img_strides = np.asarray([im.strides[0] for im in images], np.int64)
    msk_strides = np.asarray([m.strides[0] for m in masks], np.int64)
    lib.gather_patch_batch_u8(
        img_ptrs, msk_ptrs,
        coords.ctypes.data_as(ctypes.c_void_p), b, patch,
        img_strides.ctypes.data_as(ctypes.c_void_p),
        msk_strides.ctypes.data_as(ctypes.c_void_p),
        out_img.ctypes.data_as(ctypes.c_void_p),
        out_msk.ctypes.data_as(ctypes.c_void_p), num_threads)
    return out_img, out_msk[..., None]


def feathered_blend(tiles: np.ndarray, weights: np.ndarray,
                    coords: np.ndarray, out_hw: Tuple[int, int]
                    ) -> np.ndarray:
    """[T,P,P] tiles + weights scatter-blended into [H,W] (normalized)."""
    lib = _load()
    h, w = out_hw
    tiles = np.ascontiguousarray(tiles, np.float32)
    weights = np.ascontiguousarray(
        np.broadcast_to(weights, tiles.shape), np.float32)
    coords = np.ascontiguousarray(coords, np.int32)
    out = np.zeros((h, w), np.float32)
    wsum = np.zeros((h, w), np.float32)
    if lib is None:
        p = tiles.shape[1]
        for t in range(tiles.shape[0]):
            y, x = int(coords[t, 0]), int(coords[t, 1])
            out[y:y + p, x:x + p] += tiles[t] * weights[t]
            wsum[y:y + p, x:x + p] += weights[t]
    else:
        lib.feathered_blend_f32(
            tiles.ctypes.data_as(ctypes.c_void_p),
            weights.ctypes.data_as(ctypes.c_void_p),
            coords.ctypes.data_as(ctypes.c_void_p),
            tiles.shape[0], tiles.shape[1],
            out.ctypes.data_as(ctypes.c_void_p),
            wsum.ctypes.data_as(ctypes.c_void_p), h, w)
    return out / (wsum + 1e-8)


def resize_bilinear(image: np.ndarray, out_hw: Tuple[int, int],
                    num_threads: int = 6) -> np.ndarray:
    """align_corners=False bilinear resize of [H,W,C] float32 (torch
    convention, matching dataset._resize_bilinear_np)."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    oh, ow = out_hw
    if lib is None:
        from vaeunet_tpu.data.dataset import _resize_bilinear_np
        return _resize_bilinear_np(image, out_hw)
    out = np.empty((oh, ow, c), np.float32)
    lib.resize_bilinear_f32(
        image.ctypes.data_as(ctypes.c_void_p), h, w, c,
        out.ctypes.data_as(ctypes.c_void_p), oh, ow, num_threads)
    return out
