from vaeunet_tpu.compat.torch_weights import (
    convert_unet_state_dict,
    convert_unet_resnet_state_dict,
    load_reference_checkpoint,
)

__all__ = [
    "convert_unet_state_dict",
    "convert_unet_resnet_state_dict",
    "load_reference_checkpoint",
]
