"""Auxiliary subsystems: checkpoint/resume, metric logging, seeding.

Replaces the reference's utility layer (dino-main/utils.py,
models/patchcore/utils.py, Unsupervised-Classification-master/utils/).
"""

from tpu_ac.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
)
from tpu_ac.utils.logging import (LaggedFetch, MetricLogger, SmoothedValue,
                                  StepTimer)
from tpu_ac.utils.seeding import fix_seeds

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "LaggedFetch",
    "MetricLogger",
    "SmoothedValue",
    "StepTimer",
    "fix_seeds",
]
