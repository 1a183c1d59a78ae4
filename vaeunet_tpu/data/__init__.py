from vaeunet_tpu.data.dataset import IDRIDDataset
from vaeunet_tpu.data.loader import Loader

__all__ = ["IDRIDDataset", "Loader"]
