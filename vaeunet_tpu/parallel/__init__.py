from vaeunet_tpu.parallel.mesh import make_mesh, shard_batch
from vaeunet_tpu.parallel.dp import make_dp_train_step, train_model_dp

__all__ = ["make_mesh", "shard_batch", "make_dp_train_step", "train_model_dp"]
