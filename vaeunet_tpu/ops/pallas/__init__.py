from vaeunet_tpu.ops.pallas.reparam import reparameterize_pallas
from vaeunet_tpu.ops.pallas.bn_relu import fused_bn_relu

__all__ = ["reparameterize_pallas", "fused_bn_relu"]
