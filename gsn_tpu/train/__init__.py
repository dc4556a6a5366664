from .checkpoint import load_checkpoint, save_checkpoint
from .isomorphism import embed_graphs, pairwise_failures, run_isomorphism_test
from .loop import Trainer, TrainerConfig, TrainState
from .metrics import (LOSSES, PREDICTION_FNS, average_precision_score,
                      roc_auc_score)
from .optim import make_optimizer, make_scheduler

__all__ = [
    "load_checkpoint", "save_checkpoint", "embed_graphs",
    "pairwise_failures", "run_isomorphism_test", "Trainer", "TrainerConfig",
    "TrainState", "LOSSES", "PREDICTION_FNS", "average_precision_score",
    "roc_auc_score", "make_optimizer", "make_scheduler",
]
