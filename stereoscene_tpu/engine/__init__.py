from .train import TrainState, create_train_state, make_train_step, compute_losses
from .eval import make_eval_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "compute_losses",
]
