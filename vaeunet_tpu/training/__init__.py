from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.state import TrainState, create_train_state
from vaeunet_tpu.training.step import make_train_step, make_eval_step
from vaeunet_tpu.training.schedule import ReduceLROnPlateau

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "ReduceLROnPlateau",
]
