"""Model zoo: functional JAX models with torch-checkpoint-compatible params.

Models are pure functions over flat parameter dicts whose keys mirror the
torch state_dict names of the corresponding reference checkpoints
(e.g. ``blocks.10.attn.qkv.weight``), so conversion from released DINO /
timm checkpoints is a mechanical array copy (see tpu_ac.models.convert).
"""

from tpu_ac.models.vit import (
    ViTConfig,
    VIT_TINY,
    VIT_SMALL,
    VIT_BASE,
    init_vit_params,
    vit_forward,
    vit_cls_forward,
    vit_intermediate_layers,
    vit_last_selfattention,
)
from tpu_ac.models.dino_head import init_dino_head_params, dino_head_forward
from tpu_ac.models.registry import load_backbone, BACKBONE_CONFIGS

__all__ = [
    "ViTConfig",
    "VIT_TINY",
    "VIT_SMALL",
    "VIT_BASE",
    "init_vit_params",
    "vit_forward",
    "vit_cls_forward",
    "vit_intermediate_layers",
    "vit_last_selfattention",
    "init_dino_head_params",
    "dino_head_forward",
    "load_backbone",
    "BACKBONE_CONFIGS",
]
