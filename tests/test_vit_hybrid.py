"""R50+ViT hybrid (vit_r50) — shapes, backbone/ViT composition, embed."""

import dataclasses

import numpy as np
import pytest

from tpu_ac.models.resnetv2 import ResNetV2Config
from tpu_ac.models.vit import ViTConfig
from tpu_ac.models.vit_hybrid import (
    VIT_LARGE_R50_S32,
    HybridViTConfig,
    hybrid_vit_cls_forward,
    hybrid_vit_forward,
    init_hybrid_vit_params,
)

TINY = HybridViTConfig(
    resnet=ResNetV2Config(block_counts=(1, 1, 1, 1), width_factor=1),
    vit=ViTConfig(embed_dim=64, depth=3, num_heads=2, img_size=64),
    total_stride=32)


@pytest.fixture(scope="module")
def tiny_params():
    return init_hybrid_vit_params(0, TINY)


class TestHybridViT:
    def test_param_layout(self, tiny_params):
        assert "patch_embed.backbone.stem.conv.weight" in tiny_params
        assert "patch_embed.backbone.stages.3.blocks.0.conv1.weight" in \
            tiny_params
        assert "patch_embed.backbone.norm.weight" in tiny_params
        assert tiny_params["patch_embed.proj.weight"].shape == (
            64, 2048, 1, 1)
        # pos_embed covers the stride-32 grid + CLS: (64/32)^2 + 1 = 5
        assert tiny_params["pos_embed"].shape == (1, 5, 64)

    def test_forward_shapes_and_taps(self, tiny_params, rng):
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        outs = hybrid_vit_forward(tiny_params, x, TINY, taps=(1, 2))
        assert outs[1].shape == (2, 5, 64)  # CLS + 2x2 grid
        assert outs[2].shape == (2, 5, 64)
        cls = hybrid_vit_cls_forward(tiny_params, x, TINY)
        assert cls.shape == (2, 64)
        assert np.isfinite(np.asarray(cls)).all()

    def test_backbone_features_feed_the_vit(self, tiny_params, rng):
        """Zeroing the ResNet stem must change the ViT output (the trunk
        actually consumes backbone features, not raw patches)."""
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        a = np.asarray(hybrid_vit_cls_forward(tiny_params, x, TINY))
        broken = dict(tiny_params)
        broken["patch_embed.backbone.stem.conv.weight"] = (
            tiny_params["patch_embed.backbone.stem.conv.weight"] * 0.0)
        b = np.asarray(hybrid_vit_cls_forward(broken, x, TINY))
        assert np.abs(a - b).max() > 1e-4

    def test_registry_and_embed_path(self, rng):
        from tpu_ac.features.embedding import EmbedConfig, embed_features
        from tpu_ac.models.registry import BACKBONE_CONFIGS

        assert BACKBONE_CONFIGS["vit_r50"].config == VIT_LARGE_R50_S32
        assert VIT_LARGE_R50_S32.vit.depth == 24
        assert VIT_LARGE_R50_S32.grid == 7
        params = init_hybrid_vit_params(0, TINY)
        ecfg = EmbedConfig(layers=("blocks.1", "blocks.2"),
                           pretrain_embed_dimension=24,
                           target_embed_dimension=48)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        z = embed_features("vit_hybrid", params, x, TINY, ecfg)
        assert z.shape == (2, 4, 48)  # 2x2 grid
        assert np.isfinite(np.asarray(z)).all()
