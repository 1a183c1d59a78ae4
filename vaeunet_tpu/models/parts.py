"""U-Net building blocks (flax, NHWC).

Functional rebuilds of the reference's ``unet/unet_parts.py``:
- AttentionGate   <- unet/unet_parts.py:7-30
- DoubleConv      <- unet/unet_parts.py:32-49
- Down            <- unet/unet_parts.py:51-63
- Up              <- unet/unet_parts.py:65-95 (bilinear or transpose-conv,
                     asymmetric pad-to-match, attention-gated skip)
- OutConv         <- unet/unet_parts.py:97-103

`train=True` switches BatchNorm to batch statistics (and mutates the
``batch_stats`` collection); `train=False` is the inference path used for
parity checks against the reference.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from vaeunet_tpu.ops.layers import BatchNorm, Conv, ConvTranspose2x
from vaeunet_tpu.ops.pool import max_pool
from vaeunet_tpu.ops.resize import upsample2x_bilinear_align_corners


class AttentionGate(nn.Module):
    """Additive attention gate: psi = sigmoid(BN(1x1(relu(BN(1x1(g)) + BN(1x1(x))))));
    returns x * psi.  (reference unet/unet_parts.py:7-30)"""

    f_int: int

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = Conv(self.f_int, kernel_size=1, name="W_g_conv")(g)
        g1 = BatchNorm(self.f_int, name="W_g_bn")(g1, use_running_average=not train)
        x1 = Conv(self.f_int, kernel_size=1, name="W_x_conv")(x)
        x1 = BatchNorm(self.f_int, name="W_x_bn")(x1, use_running_average=not train)
        psi = nn.relu(g1 + x1)
        psi = Conv(1, kernel_size=1, name="psi_conv")(psi)
        psi = BatchNorm(1, name="psi_bn")(psi, use_running_average=not train)
        psi = nn.sigmoid(psi)
        # capturable attention map (apply with mutable=['intermediates']);
        # replaces the reference's forward hooks (analyze_model.py:48-57)
        self.sow("intermediates", "psi", psi)
        return x * psi


class DoubleConv(nn.Module):
    """(3x3 conv bias=False -> BN -> ReLU) x 2.  (unet/unet_parts.py:32-49)"""

    out_channels: int
    mid_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        x = Conv(mid, kernel_size=3, padding=1, use_bias=False, name="conv1")(x)
        x = BatchNorm(mid, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(self.out_channels, kernel_size=3, padding=1, use_bias=False,
                 name="conv2")(x)
        x = BatchNorm(self.out_channels, name="bn2")(x, use_running_average=not train)
        return nn.relu(x)


class Down(nn.Module):
    """MaxPool(2) then DoubleConv.  (unet/unet_parts.py:51-63)"""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = max_pool(x, window=2)
        return DoubleConv(self.out_channels, name="conv")(x, train=train)


def _pad_to_match(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric zero-pad of x1's H/W up to x2's, PyTorch F.pad order
    (left = diff//2, right = diff - diff//2).  (unet/unet_parts.py:85-89)"""
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    if dh == 0 and dw == 0:
        return x1
    return jnp.pad(
        x1,
        ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
    )


class Up(nn.Module):
    """Upsample x1 (bilinear align-corners or transpose-conv k2s2), pad to the
    skip's size, attention-gate the skip on the upsampled features, concat
    [skip, x1] and DoubleConv.  (unet/unet_parts.py:65-95)

    Note the reference applies its AttentionGate to the skip *even in the
    plain UNet* — a deliberate deviation from stock milesial that we keep for
    parity (SURVEY.md section 2.3).
    """

    in_channels: int
    out_channels: int
    bilinear: bool = True

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        if self.bilinear:
            x1 = upsample2x_bilinear_align_corners(x1)
        else:
            x1 = ConvTranspose2x(self.in_channels // 2, name="up")(x1)
        x1 = _pad_to_match(x1, x2)
        x2 = AttentionGate(self.in_channels // 4, name="attention")(
            x1, x2, train=train)
        x = jnp.concatenate([x2, x1], axis=-1)
        mid = self.in_channels // 2 if self.bilinear else None
        return DoubleConv(self.out_channels, mid_channels=mid, name="conv")(
            x, train=train)


class OutConv(nn.Module):
    """1x1 output conv.  (unet/unet_parts.py:97-103)"""

    n_classes: int

    @nn.compact
    def __call__(self, x):
        return Conv(self.n_classes, kernel_size=1, name="conv")(x)
