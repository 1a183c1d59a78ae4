"""ResNet-34 feature encoder, flax/NHWC.

TPU-native rebuild of the encoder the reference obtains from
``timm.create_model('resnet34', features_only=True, in_chans=n_channels)``
(reference unet/unet_resnet.py:131-137).  Returns the same 5 feature maps:

  index  source                stride  channels
  0      stem act (conv7x7/2)  2       64
  1      layer1 (3 blocks)     4       64
  2      layer2 (4 blocks)     8       128
  3      layer3 (6 blocks)     16      256
  4      layer4 (3 blocks)     32      512

Pretrained torchvision/timm weights can be imported through
``vaeunet_tpu.compat.torch_weights`` (NCHW->NHWC, OIHW->HWIO, BN stat
remapping); without a weights file the encoder trains from scratch.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from vaeunet_tpu.ops.fused import fused_conv_bn_enabled
from vaeunet_tpu.ops.layers import BatchNorm, Conv
from vaeunet_tpu.ops.pool import max_pool


def conv3x3_bn(x, features, stride, train, conv_name, bn_name,
               save_names=False):
    """conv3x3(s)-BN pair; routes through the fused conv+BN-stats Pallas
    kernel on the training path when enabled (stride-1 only)."""
    conv = Conv(features, kernel_size=3, stride=stride, padding=1,
                use_bias=False, name=conv_name)
    bn = BatchNorm(features, name=bn_name)
    if train and stride == 1 and features == 64 and fused_conv_bn_enabled():
        y, s, q = conv(x, collect_stats=True)
        return bn(y, use_running_average=False, moments=(s, q))
    y = conv(x)
    if save_names:
        # 'remat_save': under remat_policy='save_convs' the conv product is
        # kept and only the BN/ReLU epilogue is recomputed in backward.
        y = checkpoint_name(y, "remat_save")
    return bn(y, use_running_average=not train)


class BasicBlock(nn.Module):
    """conv3x3(s)-BN-ReLU-conv3x3-BN + identity/1x1-downsample, ReLU."""

    features: int
    stride: int = 1
    save_names: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = conv3x3_bn(x, self.features, self.stride, train, "conv1", "bn1",
                       save_names=self.save_names)
        y = nn.relu(y)
        y = conv3x3_bn(y, self.features, 1, train, "conv2", "bn2",
                       save_names=self.save_names)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv(self.features, kernel_size=1, stride=self.stride,
                            use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(self.features, name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class BottleneckBlock(nn.Module):
    """1x1 reduce - 3x3(s) - 1x1 expand(4x) + identity/1x1-downsample
    (resnet50-family)."""

    features: int  # bottleneck width; output = 4 * features
    stride: int = 1
    save_names: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = 4 * self.features
        identity = x
        y = Conv(self.features, kernel_size=1, use_bias=False, name="conv1")(x)
        y = BatchNorm(self.features, name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = conv3x3_bn(y, self.features, self.stride, train, "conv2", "bn2",
                       save_names=self.save_names)
        y = nn.relu(y)
        y = Conv(out_features, kernel_size=1, use_bias=False, name="conv3")(y)
        y = BatchNorm(out_features, name="bn3")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != out_features:
            identity = Conv(out_features, kernel_size=1, stride=self.stride,
                            use_bias=False, name="downsample_conv")(x)
            identity = BatchNorm(out_features, name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


# backbone name -> (stage sizes, bottleneck?)
RESNET_CONFIGS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
}


class ResNetEncoder(nn.Module):
    """Feature-pyramid encoder for the resnet18/34/50/101 family;
    `__call__` returns the 5 feature maps."""

    n_channels: int = 3
    backbone: str = "resnet34"
    stage_features: Sequence[int] = (64, 128, 256, 512)
    # Rematerialize residual blocks in backward; with
    # remat_policy='save_convs' only BN/ReLU epilogues are recomputed
    # (conv products carry the 'remat_save' checkpoint_name).
    use_remat: bool = False
    remat_policy: str = "full"

    # channels of each returned feature map, mirroring
    # timm's ``feature_info.channels()`` (unet_resnet.py:137)
    @property
    def feature_channels(self) -> List[int]:
        _, bottleneck = RESNET_CONFIGS[self.backbone]
        mult = 4 if bottleneck else 1
        return [64, *(f * mult for f in self.stage_features)]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        assert x.shape[-1] == self.n_channels
        stage_sizes, bottleneck = RESNET_CONFIGS[self.backbone]
        block_cls = BottleneckBlock if bottleneck else BasicBlock
        save_names = self.use_remat and self.remat_policy == "save_convs"
        if self.use_remat:
            policy = (jax.checkpoint_policies.save_only_these_names("remat_save")
                      if save_names else None)
            block_cls = nn.remat(block_cls, static_argnums=(2,), policy=policy)
        feats = []
        x = Conv(64, kernel_size=7, stride=2, padding=3, use_bias=False,
                 name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        feats.append(x)                       # stride 2
        x = max_pool(x, window=3, stride=2, padding=1)
        for si, (n_blocks, features) in enumerate(
                zip(stage_sizes, self.stage_features)):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = block_cls(features, stride, save_names,
                              name=f"layer{si + 1}_{bi}")(x, train)
            feats.append(x)                   # strides 4, 8, 16, 32
        return feats


class ResNet34Encoder(ResNetEncoder):
    """Back-compat alias with the original name."""
    backbone: str = "resnet34"
