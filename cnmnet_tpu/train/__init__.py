from cnmnet_tpu.train.state import CNMTrainState, create_train_state
from cnmnet_tpu.train.losses import compute_losses, LossWeights
from cnmnet_tpu.train.loop import make_train_step, train_loop

__all__ = [
    "CNMTrainState",
    "create_train_state",
    "compute_losses",
    "LossWeights",
    "make_train_step",
    "train_loop",
]
