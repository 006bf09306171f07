from domain_rag_system_tpu.training.contrastive import (
    ContrastiveTrainer,
    TrainState,
    infonce_loss,
    make_train_step,
)
from domain_rag_system_tpu.training.partitioning import param_partition_spec
from domain_rag_system_tpu.training.pretrain import (
    BertForMLM,
    MLMTrainer,
    build_ict_pairs,
    make_mlm_batches,
    mask_tokens,
)

__all__ = [
    "BertForMLM",
    "ContrastiveTrainer",
    "MLMTrainer",
    "TrainState",
    "build_ict_pairs",
    "infonce_loss",
    "make_mlm_batches",
    "make_train_step",
    "mask_tokens",
    "param_partition_spec",
]
