from lighthand_tpu.train.state import TrainState, create_train_state, cosine_lr
from lighthand_tpu.train.step import make_train_step, make_eval_step

__all__ = [
    "TrainState",
    "create_train_state",
    "cosine_lr",
    "make_train_step",
    "make_eval_step",
]
