"""Backbone registry — the patchcore.backbones.load equivalent.

The reference resolves ~40 timm/torchvision names plus four special-cased
DINO hub checkpoints (backbones.py:7-79).  Here each known name maps to a
(model family, config, hub checkpoint filename); weights load from a local
checkpoint directory (no-egress environments cannot hit torch.hub) and fall
back to deterministic random init when absent.

Note the reference bug reproduced-as-documentation: backbones.load builds
``vit_base`` regardless of the dino_* name (backbones.py:70), so
``dino_deitsmall*`` checkpoints could never load there.  We build the
*correct* architecture per name.
"""

from __future__ import annotations

import dataclasses
import logging
import os

from tpu_ac.models.vit import (
    VIT_BASE,
    VIT_SMALL,
    init_vit_params,
)
from tpu_ac.models.convert import load_torch_checkpoint

LOGGER = logging.getLogger(__name__)

_DEFAULT_CKPT_DIRS = (
    os.path.expanduser("~/.cache/tpu_ac/checkpoints"),
    os.path.expanduser("~/.cache/torch/hub/checkpoints"),
)


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    family: str  # "vit" | "resnet"
    config: object
    checkpoint: str | None  # local filename of the released weights
    checkpoint_key: str | None = None


BACKBONE_CONFIGS: dict[str, BackboneSpec] = {
    # DINO hub checkpoints (backbones.py:53-79, hubconf.py:22-151)
    "dino_vitbase8": BackboneSpec(
        "vit", dataclasses.replace(VIT_BASE, patch_size=8),
        "dino_vitbase8_pretrain.pth"),
    "dino_vitbase16": BackboneSpec(
        "vit", dataclasses.replace(VIT_BASE, patch_size=16),
        "dino_vitbase16_pretrain.pth"),
    "dino_deitsmall16": BackboneSpec(
        "vit", dataclasses.replace(VIT_SMALL, patch_size=16),
        "dino_deitsmall16_pretrain.pth"),
    "dino_deitsmall8_300ep": BackboneSpec(
        "vit", dataclasses.replace(VIT_SMALL, patch_size=8),
        "dino_deitsmall8_300ep_pretrain.pth"),
    "dino_deitsmall8": BackboneSpec(
        "vit", dataclasses.replace(VIT_SMALL, patch_size=8),
        "dino_deitsmall8_pretrain.pth"),
}


def _register_xcits() -> None:
    """dino_xcit_* hub models (dino-main/hubconf.py:98-151)."""
    from tpu_ac.models.xcit import (
        XCIT_MEDIUM_24_P8,
        XCIT_MEDIUM_24_P16,
        XCIT_SMALL_12_P8,
        XCIT_SMALL_12_P16,
    )

    for name, cfg in (
            ("dino_xcit_small_12_p16", XCIT_SMALL_12_P16),
            ("dino_xcit_small_12_p8", XCIT_SMALL_12_P8),
            ("dino_xcit_medium_24_p16", XCIT_MEDIUM_24_P16),
            ("dino_xcit_medium_24_p8", XCIT_MEDIUM_24_P8)):
        BACKBONE_CONFIGS[name] = BackboneSpec(
            "xcit", cfg, f"{name}_pretrain.pth")


_register_xcits()


def _register_swins() -> None:
    """vit_swin_base / vit_swin_large (backbones.py:42-43) + the smaller
    published variants."""
    from tpu_ac.models.swin import (
        SWIN_BASE,
        SWIN_LARGE,
        SWIN_SMALL,
        SWIN_TINY,
    )

    for name, cfg, ckpt in (
            ("vit_swin_base", SWIN_BASE, "swin_base_patch4_window7_224.pth"),
            ("vit_swin_large", SWIN_LARGE,
             "swin_large_patch4_window7_224.pth"),
            ("swin_tiny", SWIN_TINY, "swin_tiny_patch4_window7_224.pth"),
            ("swin_small", SWIN_SMALL, "swin_small_patch4_window7_224.pth")):
        BACKBONE_CONFIGS[name] = BackboneSpec("swin", cfg, ckpt)


_register_swins()


def _register_hybrids() -> None:
    """vit_r50 (backbones.py:39, timm vit_large_r50_s32_224)."""
    from tpu_ac.models.vit_hybrid import VIT_LARGE_R50_S32

    BACKBONE_CONFIGS["vit_r50"] = BackboneSpec(
        "vit_hybrid", VIT_LARGE_R50_S32, "vit_large_r50_s32_224.pth")


_register_hybrids()


def _register_inceptions_resnest() -> None:
    """inception_v4 (backbones.py:34), bninception (backbones.py:8-9),
    resnest50 (backbones.py:14)."""
    from tpu_ac.models.inception import BNINCEPTION, INCEPTION_V4
    from tpu_ac.models.resnest import RESNEST50D_4S2X40D

    BACKBONE_CONFIGS["inception_v4"] = BackboneSpec(
        "inception_v4", INCEPTION_V4, "inception_v4.pth")
    BACKBONE_CONFIGS["bninception"] = BackboneSpec(
        "bninception", BNINCEPTION, "bn_inception.pth")
    BACKBONE_CONFIGS["resnest50"] = BackboneSpec(
        "resnest", RESNEST50D_4S2X40D, "resnest50d_4s2x40d.pth")


_register_inceptions_resnest()


def _register_timm_vits() -> None:
    """timm ViT names from the reference registry (backbones.py:35-40).
    timm checkpoints share the blocks.* state_dict layout, so conversion
    is the same array copy."""
    from tpu_ac.models.vit import VIT_LARGE

    BACKBONE_CONFIGS["vit_small"] = BackboneSpec(
        "vit", dataclasses.replace(VIT_SMALL, patch_size=8),
        "vit_small_patch8_224.pth")
    BACKBONE_CONFIGS["vit_base"] = BackboneSpec(
        "vit", dataclasses.replace(VIT_BASE, patch_size=8),
        "vit_base_patch8_224.pth")
    BACKBONE_CONFIGS["vit_large"] = BackboneSpec(
        "vit", dataclasses.replace(VIT_LARGE, patch_size=8),
        "vit_large_patch8_224.pth")
    BACKBONE_CONFIGS["vit_deit_base"] = BackboneSpec(
        "vit", dataclasses.replace(VIT_BASE, patch_size=8),
        "deit_base_patch8_224.pth")
    BACKBONE_CONFIGS["vit_deit_distilled"] = BackboneSpec(
        "vit", dataclasses.replace(VIT_BASE, patch_size=8,
                                   num_prefix_tokens=2),
        "deit_base_distilled_patch8_224.pth")


_register_timm_vits()


def _register_resnetv2s() -> None:
    from tpu_ac.models.resnetv2 import (
        RESNETV2_101, RESNETV2_50X3, RESNETV2_101X3, RESNETV2_152X2,
        RESNETV2_152X4)

    for name, cfg, ckpt in (
            ("resnetv2_50_bit", RESNETV2_50X3, "resnetv2_50x3_bitm.pth"),
            ("resnetv2_50_21k", RESNETV2_50X3, "resnetv2_50x3_bitm_in21k.pth"),
            ("resnetv2_101_bit", RESNETV2_101X3, "resnetv2_101x3_bitm.pth"),
            ("resnetv2_101_21k", RESNETV2_101X3,
             "resnetv2_101x3_bitm_in21k.pth"),
            ("resnetv2_152_bit", RESNETV2_152X4, "resnetv2_152x4_bitm.pth"),
            ("resnetv2_152_21k", RESNETV2_152X4,
             "resnetv2_152x4_bitm_in21k.pth"),
            ("resnetv2_152_384", RESNETV2_152X2,
             "resnetv2_152x2_bit_teacher_384.pth"),
            ("resnetv2_101", RESNETV2_101, "resnetv2_101.pth")):
        BACKBONE_CONFIGS[name] = BackboneSpec("resnetv2", cfg, ckpt)


_register_resnetv2s()


def _register_efficientnets() -> None:
    from tpu_ac.models.efficientnet import (
        EFFICIENTNET_B1, EFFICIENTNET_B3, EFFICIENTNET_B5, EFFICIENTNET_B7)

    for name, cfg, ckpt in (
            ("efficientnet_b1", EFFICIENTNET_B1, "tf_efficientnet_b1.pth"),
            ("efficientnet_b3", EFFICIENTNET_B3, "tf_efficientnet_b3.pth"),
            ("efficientnet_b5", EFFICIENTNET_B5, "tf_efficientnet_b5.pth"),
            ("efficientnet_b7", EFFICIENTNET_B7, "tf_efficientnet_b7.pth")):
        BACKBONE_CONFIGS[name] = BackboneSpec("efficientnet", cfg, ckpt)

    from tpu_ac.models.efficientnet import MNASNET_A1, MNASNET_B1

    BACKBONE_CONFIGS["mnasnet_100"] = BackboneSpec(
        "mnasnet", MNASNET_B1, "mnasnet_100.pth")
    BACKBONE_CONFIGS["mnasnet_b1"] = BackboneSpec(
        "mnasnet", MNASNET_B1, "mnasnet_b1.pth")
    BACKBONE_CONFIGS["mnasnet_a1"] = BackboneSpec(
        "mnasnet", MNASNET_A1, "mnasnet_a1.pth")

    # b3a = the same B3 architecture trained NATIVELY (not a tf_ port):
    # symmetric k//2 padding and torch bn eps, unlike the tf_ variants
    import dataclasses as _dc

    BACKBONE_CONFIGS["efficientnet_b3a"] = BackboneSpec(
        "efficientnet",
        _dc.replace(EFFICIENTNET_B3, tf_same=False, bn_eps=1e-5),
        "efficientnet_b3a.pth")

    from tpu_ac.models.efficientnet import (
        EFFICIENTNETV2_L,
        EFFICIENTNETV2_M,
    )

    BACKBONE_CONFIGS["efficientnetv2_m"] = BackboneSpec(
        "efficientnetv2", EFFICIENTNETV2_M, "tf_efficientnetv2_m.pth")
    BACKBONE_CONFIGS["efficientnetv2_l"] = BackboneSpec(
        "efficientnetv2", EFFICIENTNETV2_L, "tf_efficientnetv2_l.pth")


_register_efficientnets()


def _register_vggs() -> None:
    from tpu_ac.models.vgg import ALEXNET, VGG11, VGG19, VGG19_BN

    BACKBONE_CONFIGS["alexnet"] = BackboneSpec(
        "alexnet", ALEXNET, "alexnet-owt-7be5be79.pth")

    BACKBONE_CONFIGS["vgg11"] = BackboneSpec(
        "vgg", VGG11, "vgg11-8a719046.pth")
    BACKBONE_CONFIGS["vgg19"] = BackboneSpec(
        "vgg", VGG19, "vgg19-dcbb9e9d.pth")
    BACKBONE_CONFIGS["vgg19_bn"] = BackboneSpec(
        "vgg", VGG19_BN, "vgg19_bn-c79401a0.pth")


_register_vggs()


def _register_resnets() -> None:
    from tpu_ac.models.resnet import (
        RESNET18,
        RESNET34,
        RESNET50,
        RESNET101,
        RESNET200,
        RESNEXT101_32X8D,
        WIDE_RESNET50_2,
        WIDE_RESNET101_2,
    )

    # torchvision names used by the reference registry (backbones.py:7-50)
    BACKBONE_CONFIGS["resnet18"] = BackboneSpec(
        "resnet", RESNET18, "resnet18-f37072fd.pth")
    BACKBONE_CONFIGS["resnet34"] = BackboneSpec(
        "resnet", RESNET34, "resnet34-b627a593.pth")
    BACKBONE_CONFIGS["resnet50"] = BackboneSpec(
        "resnet", RESNET50, "resnet50-0676ba61.pth")
    BACKBONE_CONFIGS["resnet101"] = BackboneSpec(
        "resnet", RESNET101, "resnet101-63fe2227.pth")
    BACKBONE_CONFIGS["wideresnet50"] = BackboneSpec(
        "resnet", WIDE_RESNET50_2, "wide_resnet50_2-95faca4d.pth")
    BACKBONE_CONFIGS["wideresnet101"] = BackboneSpec(
        "resnet", WIDE_RESNET101_2, "wide_resnet101_2-32ee1156.pth")
    BACKBONE_CONFIGS["resnet200"] = BackboneSpec(
        "resnet", RESNET200, "resnet200.pth")
    BACKBONE_CONFIGS["resnext101"] = BackboneSpec(
        "resnet", RESNEXT101_32X8D, "resnext101_32x8d-8ba56ff5.pth")
    BACKBONE_CONFIGS["dino_resnet50"] = BackboneSpec(
        "resnet", RESNET50, "dino_resnet50_pretrain.pth")

    from tpu_ac.models.densenet import DENSENET121, DENSENET169, DENSENET201

    BACKBONE_CONFIGS["densenet121"] = BackboneSpec(
        "densenet", DENSENET121, "densenet121-a639ec97.pth")
    BACKBONE_CONFIGS["densenet169"] = BackboneSpec(
        "densenet", DENSENET169, "densenet169-b2777c0a.pth")
    BACKBONE_CONFIGS["densenet201"] = BackboneSpec(
        "densenet", DENSENET201, "densenet201-c1103571.pth")


_register_resnets()


# the shipped registry, snapshotted before any runtime register_backbone
# calls (tests register tiny throwaway architectures) — the frozen
# checkpoint manifests cover exactly this set
BUILTIN_BACKBONES = frozenset(BACKBONE_CONFIGS)


def register_backbone(name: str, spec: BackboneSpec) -> None:
    BACKBONE_CONFIGS[name] = spec


def _find_checkpoint(filename: str | None, checkpoint_dir: str | None) -> str | None:
    if filename is None:
        return None
    dirs = ((checkpoint_dir,) if checkpoint_dir else ()) + _DEFAULT_CKPT_DIRS
    for d in dirs:
        if d is None:
            continue
        path = os.path.join(d, filename)
        if os.path.exists(path):
            return path
    return None


def load_backbone(name: str, *, checkpoint_dir: str | None = None,
                  checkpoint_path: str | None = None, seed: int = 0,
                  use_checkpoint: bool = True):
    """Resolve a backbone name to (params, config, family).

    Weights come from ``checkpoint_path`` if given, else from the first
    matching file under ``checkpoint_dir`` / default cache dirs, else a
    deterministic random init (with a warning — metrics parity obviously
    requires the released weights).  ``use_checkpoint=False`` forces the
    random init even when a cached checkpoint exists (structure probes
    like convert.validate_params_against_backbone need the architecture's
    own key layout, not the checkpoint's).
    """
    if name not in BACKBONE_CONFIGS:
        raise KeyError(
            f"Unknown backbone '{name}'. Registered: {sorted(BACKBONE_CONFIGS)}")
    spec = BACKBONE_CONFIGS[name]
    path = None
    if use_checkpoint:
        path = checkpoint_path or _find_checkpoint(spec.checkpoint,
                                                   checkpoint_dir)
    if path is not None:
        params = load_torch_checkpoint(path, spec.checkpoint_key)
    else:
        LOGGER.warning(
            "No checkpoint found for %s — using random init (seed=%d). "
            "Place the released weights in %s for metric parity.",
            name, seed, _DEFAULT_CKPT_DIRS[0])
        if spec.family not in FAMILY_INITS:
            raise NotImplementedError(f"family {spec.family}")
        import importlib

        mod_name, attr = FAMILY_INITS[spec.family].split(":")
        init = getattr(importlib.import_module(mod_name), attr)
        params = init(seed, spec.config)
    return params, spec.config, spec.family


# family -> "module:init_fn" (lazy import).  Adding a backbone family =
# one row here + one in features.embedding.FAMILY_EMBEDDERS.
FAMILY_INITS: dict[str, str] = {
    "vit": "tpu_ac.models.vit:init_vit_params",
    "resnet": "tpu_ac.models.resnet:init_resnet_params",
    "densenet": "tpu_ac.models.densenet:init_densenet_params",
    "vgg": "tpu_ac.models.vgg:init_vgg_params",
    "alexnet": "tpu_ac.models.vgg:init_alexnet_params",
    "efficientnet": "tpu_ac.models.efficientnet:init_efficientnet_params",
    "efficientnetv2": "tpu_ac.models.efficientnet:init_efficientnetv2_params",
    "mnasnet": "tpu_ac.models.efficientnet:init_mnasnet_params",
    "resnetv2": "tpu_ac.models.resnetv2:init_resnetv2_params",
    "xcit": "tpu_ac.models.xcit:init_xcit_params",
    "swin": "tpu_ac.models.swin:init_swin_params",
    "vit_hybrid": "tpu_ac.models.vit_hybrid:init_hybrid_vit_params",
    "inception_v4": "tpu_ac.models.inception:init_inception_v4_params",
    "bninception": "tpu_ac.models.inception:init_bninception_params",
    "resnest": "tpu_ac.models.resnest:init_resnest_params",
}
