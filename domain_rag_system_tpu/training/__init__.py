from domain_rag_system_tpu.training.contrastive import (
    ContrastiveTrainer,
    TrainState,
    infonce_loss,
    make_train_step,
)
from domain_rag_system_tpu.training.partitioning import param_partition_spec

__all__ = [
    "ContrastiveTrainer",
    "TrainState",
    "infonce_loss",
    "make_train_step",
    "param_partition_spec",
]
