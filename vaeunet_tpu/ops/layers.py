"""Flax layer primitives with PyTorch-parity semantics, NHWC layout.

These are the building blocks the model zoo is assembled from.  Two details
matter for numerical parity with the reference:

- **BatchNorm**: PyTorch (``nn.BatchNorm2d``) normalizes with the *biased*
  batch variance but updates the running variance with the *unbiased*
  estimate, using ``running = (1-m)*running + m*batch`` with m=0.1.  Flax's
  ``nn.BatchNorm`` uses the biased estimate for both, so we roll our own.
- **Conv init**: PyTorch convs default to kaiming-uniform(a=sqrt(5)) weights
  and uniform(+-1/sqrt(fan_in)) bias.  Matching the init distribution keeps
  from-scratch training dynamics comparable to the reference.

Everything is NHWC / HWIO — the native TPU layout (XLA on TPU prefers
channels-last; no ``channels_last`` memory-format gymnastics needed, cf.
reference train.py:346).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) over HWIO kernels — PyTorch Conv2d default."""
    h, w, i, _ = shape
    fan_in = h * w * i
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)  # gain/sqrt(fan_in)*sqrt(3)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """2D convolution, NHWC/HWIO, PyTorch-default init.

    ``padding`` is the symmetric spatial zero-pad (int), matching
    ``nn.Conv2d(..., padding=p)``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        kernel_shape = (k, k, in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kernel_shape)
        dtype = self.dtype or x.dtype
        # NB: no preferred_element_type here — the TPU MXU already
        # accumulates bf16 convs in fp32, and setting it breaks the VJP
        # (fp32 cotangent vs bf16 kernel in the transpose conv).
        y = lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            fan_in = k * k * (in_features // self.feature_group_count)
            bias = self.param("bias", torch_conv_bias_init_for(fan_in),
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class ConvTranspose2x(nn.Module):
    """``nn.ConvTranspose2d(in, out, kernel_size=2, stride=2)`` equivalent
    (reference unet/unet_parts.py:76).

    Implemented as ``lax.conv_transpose`` with ``transpose_kernel=True`` so a
    converted PyTorch weight (IOHW -> HWIO after transposition) produces
    identical outputs.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (2, 2, self.features, in_features)
        )
        dtype = self.dtype or x.dtype
        y = lax.conv_transpose(
            x.astype(dtype),
            kernel.astype(dtype),
            strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        bias = self.param("bias", torch_conv_bias_init_for(4 * in_features),
                          (self.features,))
        return (y + bias.astype(y.dtype)).astype(dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with exact PyTorch semantics over NHWC.

    - training: normalize with biased batch statistics over (N, H, W); update
      running stats as ``(1-m)*running + m*batch`` with the *unbiased*
      variance (PyTorch convention), m = 0.1.
    - eval: normalize with running stats.
    - stats and affine params are always fp32 (bf16-safe); the normalized
      output is cast back to the input dtype.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            # one-pass variance (both reductions fuse into a single HBM
            # sweep), clamped at 0: the raw E[x^2]-mean^2 form can round to
            # a small negative for near-constant channels (dead ReLUs) and
            # NaN the rsqrt.
            var = jnp.maximum(
                jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean), 0.0)
            n = x.size // self.features
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        inv = lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)
