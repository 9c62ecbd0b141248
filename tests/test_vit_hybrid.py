"""R50+ViT hybrid (vit_r50) — shapes, backbone/ViT composition, embed."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

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


class TestPostActTrunk:
    """The hybrid's backbone is timm's preact=False + StdConv2dSame layout."""

    def test_hybrid_config_is_postact_same(self):
        from tpu_ac.models.vit_hybrid import VIT_LARGE_R50_S32

        assert not VIT_LARGE_R50_S32.resnet.preact
        assert VIT_LARGE_R50_S32.resnet.tf_same

    def test_postact_key_layout(self):
        """Post-act trunks carry stem.norm and downsample.norm (the real
        vit_large_r50_s32_224 state_dict has them) and NO final norm."""
        from tpu_ac.models.resnetv2 import ResNetV2Config, init_resnetv2_params
        from tpu_ac.models.vit_hybrid import (
            VIT_LARGE_R50_S32,
            init_hybrid_vit_params,
        )

        cfg = ResNetV2Config(block_counts=(1, 1), preact=False, tf_same=True)
        p = init_resnetv2_params(0, cfg)
        assert "stem.norm.weight" in p
        assert "stages.0.blocks.0.downsample.norm.weight" in p
        assert "norm.weight" not in p
        hp = init_hybrid_vit_params(0, VIT_LARGE_R50_S32)
        assert "patch_embed.backbone.stem.norm.weight" in hp
        assert "patch_embed.backbone.norm.weight" not in hp
        assert "norm.weight" in hp  # the ViT trunk norm stays

    def test_postact_block_matches_torch_oracle(self, rng):
        """One strided post-act bottleneck vs torch (StdConv2dSame = weight
        standardization + TF SAME pads, GN(+relu), normed downsample, relu
        after the add)."""
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.resnetv2 import ResNetV2Config, resnetv2_forward

        cfg = ResNetV2Config(block_counts=(1,), preact=False, tf_same=True,
                             stem_pool="same", ws_eps=1e-6, gn_groups=8)
        rng_ = np.random.default_rng(1)

        def w(shape):
            return (rng_.standard_normal(shape) * 0.1).astype(np.float32)

        p = {
            "stem.conv.weight": w((64, 3, 7, 7)),
            "stem.norm.weight": np.ones(64, np.float32),
            "stem.norm.bias": np.zeros(64, np.float32),
        }
        pre = "stages.0.blocks.0."
        p[pre + "conv1.weight"] = w((64, 64, 1, 1))
        p[pre + "norm1.weight"] = np.ones(64, np.float32)
        p[pre + "norm1.bias"] = np.zeros(64, np.float32)
        p[pre + "conv2.weight"] = w((64, 64, 3, 3))
        p[pre + "norm2.weight"] = np.ones(64, np.float32)
        p[pre + "norm2.bias"] = np.zeros(64, np.float32)
        p[pre + "conv3.weight"] = w((256, 64, 1, 1))
        p[pre + "norm3.weight"] = np.ones(256, np.float32)
        p[pre + "norm3.bias"] = np.zeros(256, np.float32)
        p[pre + "downsample.conv.weight"] = w((256, 64, 1, 1))
        p[pre + "downsample.norm.weight"] = np.ones(256, np.float32)
        p[pre + "downsample.norm.bias"] = np.zeros(256, np.float32)

        imgs = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        got = resnetv2_forward({k: jnp.asarray(v) for k, v in p.items()},
                               jnp.asarray(imgs), cfg,
                               taps=("stage1",))["stage1"]

        def std(wt):
            wt = torch.from_numpy(wt)
            m = wt.mean(dim=(1, 2, 3), keepdim=True)
            v = wt.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
            return (wt - m) * torch.rsqrt(v + 1e-6)  # StdConv2dSame default eps

        def gn(x, name, relu=True):
            y = F.group_norm(x, 8, torch.from_numpy(p[name + ".weight"]),
                             torch.from_numpy(p[name + ".bias"]), eps=1e-5)
            return F.relu(y) if relu else y

        xt = torch.from_numpy(imgs)
        # stem: 7x7/2 TF-SAME on 32px -> total pad 5 = (2, 3)
        xt = F.conv2d(F.pad(xt, (2, 3, 2, 3)), std(p["stem.conv.weight"]),
                      stride=2)
        xt = gn(xt, "stem.norm")
        # maxpool 3x3/2 TF-SAME on 16px -> (0, 1)
        xt = F.max_pool2d(F.pad(xt, (0, 1, 0, 1), value=float("-inf")),
                          3, 2)
        sc = gn(F.conv2d(xt, std(p[pre + "downsample.conv.weight"])),
                pre + "downsample.norm", relu=False)
        h = gn(F.conv2d(xt, std(p[pre + "conv1.weight"])), pre + "norm1")
        h = gn(F.conv2d(F.pad(h, (1, 1, 1, 1)), std(p[pre + "conv2.weight"])),
               pre + "norm2")
        h = gn(F.conv2d(h, std(p[pre + "conv3.weight"])), pre + "norm3",
               relu=False)
        want = F.relu(h + sc).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-5)
