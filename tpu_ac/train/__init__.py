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
    make_dino_train_step,
    cosine_scheduler,
    dino_loss,
)

__all__ = [
    "DINOConfig",
    "DINOTrainState",
    "init_dino_state",
    "make_dino_train_step",
    "cosine_scheduler",
    "dino_loss",
]
