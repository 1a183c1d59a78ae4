from vaeunet_tpu.models.unet import UNet
from vaeunet_tpu.models.vae_unet import UNetResNet, DecoderBlock
from vaeunet_tpu.models.resnet import ResNet34Encoder

__all__ = ["UNet", "UNetResNet", "DecoderBlock", "ResNet34Encoder"]
