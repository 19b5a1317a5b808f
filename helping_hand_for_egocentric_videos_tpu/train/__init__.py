from .step import (
    TrainConfig,
    TrainState,
    backbone_features,
    make_optimizer,
    make_train_step,
    pretrain_loss_and_metrics,
)
from .evaluate import EvalModel, run_egomcq, run_egtea, run_epic_mir

__all__ = [
    "TrainConfig",
    "TrainState",
    "backbone_features",
    "make_optimizer",
    "make_train_step",
    "pretrain_loss_and_metrics",
    "EvalModel",
    "run_egomcq",
    "run_egtea",
    "run_epic_mir",
]
