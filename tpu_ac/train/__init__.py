"""Training workloads: DINO self-supervised pre-training + SCAN stages.

TPU-native re-design of dino-main/main_dino.py and
Unsupervised-Classification-master: single-controller JAX — one jitted
train step over a ``jax.sharding.Mesh`` (data-parallel batch sharding, XLA
inserts the ICI collectives) instead of DDP/NCCL process groups.
"""

from tpu_ac.train.dino import (
    DINOConfig,
    DINOTrainState,
    init_dino_state,
    make_dino_multi_step,
    make_dino_train_step,
    make_schedules,
    make_step_schedule_tables,
    cosine_scheduler,
    dino_loss,
)

__all__ = [
    "DINOConfig",
    "DINOTrainState",
    "init_dino_state",
    "make_dino_multi_step",
    "make_dino_train_step",
    "make_schedules",
    "make_step_schedule_tables",
    "cosine_scheduler",
    "dino_loss",
]

from tpu_ac.train.scan import (  # noqa: E402
    SCANModelConfig,
    SCANTrainState,
    MemoryBank,
    simclr_loss,
    scan_loss,
    confidence_based_ce,
    entropy,
    init_contrastive_model,
    init_clustering_model,
    contrastive_forward,
    clustering_forward,
    init_train_state,
    make_simclr_step,
    make_scan_step,
    make_selflabel_step,
    scan_evaluate_heads,
)

__all__ += [
    "SCANModelConfig",
    "SCANTrainState",
    "MemoryBank",
    "simclr_loss",
    "scan_loss",
    "confidence_based_ce",
    "entropy",
    "init_contrastive_model",
    "init_clustering_model",
    "contrastive_forward",
    "clustering_forward",
    "init_train_state",
    "make_simclr_step",
    "make_scan_step",
    "make_selflabel_step",
    "scan_evaluate_heads",
]
