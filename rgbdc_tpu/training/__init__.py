from .losses import (
    LAMBDAS,
    rate_distortion_loss_single,
    rate_distortion_loss_united,
    lambda_from_quality,
    lambdas_from_fraction_q,
)
from .optimizers import make_dual_optimizer, multistep_lr
from .state import TrainState, create_train_state, train_step, eval_step

__all__ = [
    "LAMBDAS",
    "rate_distortion_loss_single",
    "rate_distortion_loss_united",
    "lambda_from_quality",
    "lambdas_from_fraction_q",
    "make_dual_optimizer",
    "multistep_lr",
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
]
