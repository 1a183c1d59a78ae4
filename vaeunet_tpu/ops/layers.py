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
    # 1x1/s1 convs lower to a channel dot_general by default (layout
    # freedom, see __call__); set False for the bit-exact conv-emitter
    # lowering the strict parity mode requires.
    use_dot_1x1: bool = True

    @nn.compact
    def __call__(self, x, collect_stats: bool = False):
        in_features = x.shape[-1]
        k = self.kernel_size
        kernel_shape = (k, k, in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kernel_shape)
        dtype = self.dtype or x.dtype
        if collect_stats:
            # Fused conv + BN-statistics epilogue (training path): returns
            # (y, sum_c, sumsq_c) so the downstream BatchNorm skips its
            # full-tensor HBM sweep.  Only defined for the 3x3/s1/p1
            # bias-free shape the kernel supports.
            assert (k == 3 and self.stride == 1 and self.padding == 1
                    and not self.use_bias and self.feature_group_count == 1)
            from vaeunet_tpu.ops.pallas.conv_bn_stats import conv3x3_bn_stats
            return conv3x3_bn_stats(
                x.astype(dtype), kernel.astype(dtype), dtype,
                16, jax.default_backend() not in ("tpu",))
        # NB: no preferred_element_type here — the TPU MXU already
        # accumulates bf16 convs in fp32, and setting it breaks the VJP
        # (fp32 cotangent vs bf16 kernel in the transpose conv).
        if (k == 1 and self.stride == 1 and self.feature_group_count == 1
                and self.use_dot_1x1):
            # 1x1 conv == per-pixel channel matmul; the dot_general lowering
            # gives XLA layout freedom the conv emitter lacks (HLO showed
            # pure layout copies around every attention-gate 1x1 conv).
            y = lax.dot_general(
                x.astype(dtype), kernel.astype(dtype)[0, 0],
                dimension_numbers=(((3,), (0,)), ((), ())))
        else:
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


class SlicedConv(nn.Module):
    """3x3 pad-1 conv (bias-free) whose kernel can be applied in input-channel
    slices: ``conv(concat([a, b, c])) == slice(a,0) + slice(b,ca) + slice(c,ca+cb)``.

    Used by the fused decoder to avoid materializing concatenations; the
    parameter name/shape matches ``Conv`` exactly, so checkpoints and the
    torch converter are unaffected.  Setup-style (in_features is static) so
    multiple methods can share the kernel.
    """

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", torch_conv_kernel_init,
                                 (3, 3, self.in_features, self.features))

    def __call__(self, x, start: int = 0):
        c = x.shape[-1]
        k = jax.lax.slice_in_dim(self.kernel, start, start + c, axis=2)
        return lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def constant_input_term(self, z_vec, start: int, out_hw):
        """Exact contribution of a spatially-constant input slice.

        For a constant map v, ``conv3x3_pad1(broadcast(v))[y, x] = v @ S(y, x)``
        where S sums the kernel taps whose reads fall inside the image.  By
        inclusion-exclusion over the clipped taps,

          S(y, x) = S_all - 1[y edge] * R(y) - 1[x edge] * C(x)
                    + 1[corner] * X(y, x)

        with R = the kernel row lost at a top/bottom edge, C = the column
        lost at a left/right edge, X = the doubly-subtracted corner tap.
        The term is therefore a [B,1,1,Co] broadcast plus iota-masked border
        corrections — pure elementwise ops that XLA fuses into the consumer
        add (and the following BN sweep) with **zero materialized HxW
        tensors**.  (The previous concat-of-broadcasts assembly materialized
        a [B,H-2,W,Co] buffer — 133 MB at decoder_3 — per HLO attribution.)
        z_vec: [B, D]; returns [B, H, W, features] (lazily, as a fusible
        broadcast expression).
        """
        h, w = int(out_hw[0]), int(out_hw[1])
        d = z_vec.shape[-1]
        kz = jax.lax.slice_in_dim(self.kernel, start, start + d, axis=2)
        kz = kz.astype(z_vec.dtype)

        def proj(m):                             # [D, Co] -> [B,1,1,Co]
            return (z_vec @ m)[:, None, None, :]

        s_all = proj(kz.sum((0, 1)))
        r_top, r_bot = proj(kz[0].sum(0)), proj(kz[2].sum(0))
        c_left, c_right = proj(kz[:, 0].sum(0)), proj(kz[:, 2].sum(0))
        x_tl, x_tr = proj(kz[0, 0]), proj(kz[0, 2])
        x_bl, x_br = proj(kz[2, 0]), proj(kz[2, 2])

        iy = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
        top, bot = iy == 0, iy == h - 1
        left, right = ix == 0, ix == w - 1
        zero = jnp.zeros_like(s_all)

        term = (s_all
                - jnp.where(top, r_top, zero) - jnp.where(bot, r_bot, zero)
                - jnp.where(left, c_left, zero)
                - jnp.where(right, c_right, zero)
                + jnp.where(top & left, x_tl, zero)
                + jnp.where(top & right, x_tr, zero)
                + jnp.where(bot & left, x_bl, zero)
                + jnp.where(bot & right, x_br, zero))
        b, co = z_vec.shape[0], self.features
        return jnp.broadcast_to(term, (b, h, w, co))


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
    def __call__(self, x, use_running_average: bool = True,
                 virtual_n: Optional[int] = None,
                 moments: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
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
            if moments is not None:
                # Pre-computed per-channel (sum, sumsq) from a fused conv
                # epilogue (Conv(collect_stats=True)) — no activation re-read.
                s, q = moments
                n_m = x.size // self.features
                mean = s / n_m
                var = jnp.maximum(q / n_m - jnp.square(mean), 0.0)
            else:
                x32 = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x32, axis=axes)
                # one-pass variance (both reductions fuse into a single HBM
                # sweep), clamped at 0: the raw E[x^2]-mean^2 form can round
                # to a small negative for near-constant channels (dead
                # ReLUs) and NaN the rsqrt.
                var = jnp.maximum(
                    jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean),
                    0.0)
            # virtual_n: when the caller folded a broadcast dimension away
            # (e.g. a spatially-constant latent computed at 1x1 instead of
            # HxW), the unbiased-variance correction must still use the
            # logical element count the reference would have seen.
            n = virtual_n if virtual_n is not None else x.size // self.features
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        inv = lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)
