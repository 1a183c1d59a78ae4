"""Pooling ops, NHWC layout.

TPU-native via ``lax.reduce_window`` (XLA lowers these onto the VPU with
proper tiling).  Semantics match the PyTorch layers the reference uses:
``nn.MaxPool2d(2)`` (unet/unet_parts.py:57), the ResNet stem's
``MaxPool2d(3, stride=2, padding=1)``, and ``AdaptiveAvgPool2d(1)``
(unet/unet_resnet.py:142,146).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def max_pool(x: jnp.ndarray, window: int = 2, stride: int | None = None,
             padding: int = 0) -> jnp.ndarray:
    """Max pool over the H, W axes of an NHWC tensor."""
    stride = stride or window
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    if padding:
        pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    else:
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, init, lax.max, dims, strides, pads)


def avg_pool_global(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool: [B, H, W, C] -> [B, C].

    Equivalent to ``nn.AdaptiveAvgPool2d(1)`` + squeeze
    (reference unet/unet_resnet.py:142,205)."""
    return jnp.mean(x, axis=(1, 2))
