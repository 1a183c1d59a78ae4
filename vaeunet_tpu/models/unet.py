"""Plain U-Net (milesial channel plan), flax/NHWC.

Rebuild of reference ``unet/unet_model.py:6-48``: 4 down / 4 up stages,
64->1024 channels (1024//2 at the bottom when bilinear), attention-gated
skips, 1x1 out conv.  Gradient rematerialization is a constructor flag that
wraps each stage in ``nn.remat`` (the TPU-native answer to the reference's
broken ``use_checkpointing`` method, SURVEY.md section 2.4-9) — on TPU this
trades MXU FLOPs for HBM, the standard memory lever.
"""

from __future__ import annotations

from flax import linen as nn

from vaeunet_tpu.models.parts import DoubleConv, Down, OutConv, Up


class UNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    bilinear: bool = False
    use_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.n_channels, (
            f"expected NHWC input with C={self.n_channels}, got {x.shape}")
        factor = 2 if self.bilinear else 1

        if self.use_remat:
            # static_argnums counts `self` at 0; arg 2 is `train`.
            DC = nn.remat(DoubleConv, static_argnums=(2,))
            Dn = nn.remat(Down, static_argnums=(2,))
            UpB = nn.remat(Up, static_argnums=(3,))
        else:
            DC, Dn, UpB = DoubleConv, Down, Up

        x1 = DC(64, name="inc")(x, train)
        x2 = Dn(128, name="down1")(x1, train)
        x3 = Dn(256, name="down2")(x2, train)
        x4 = Dn(512, name="down3")(x3, train)
        x5 = Dn(1024 // factor, name="down4")(x4, train)
        y = UpB(1024, 512 // factor, self.bilinear, name="up1")(x5, x4, train)
        y = UpB(512, 256 // factor, self.bilinear, name="up2")(y, x3, train)
        y = UpB(256, 128 // factor, self.bilinear, name="up3")(y, x2, train)
        y = UpB(128, 64, self.bilinear, name="up4")(y, x1, train)
        return OutConv(self.n_classes, name="outc")(y)
