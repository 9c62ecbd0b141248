"""Inception-v4, BN-Inception, ResNeSt — shapes, structure, embed path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ac.models.inception import (
    BNINCEPTION,
    INCEPTION_V4,
    _bni_in_channels,
    bninception_forward,
    inception_v4_forward,
    init_bninception_params,
    init_inception_v4_params,
)
from tpu_ac.models.resnest import (
    RESNEST50D_4S2X40D,
    _rsoftmax,
    init_resnest_params,
    resnest_forward,
)


class TestInceptionV4:
    @pytest.fixture(scope="class")
    def params(self):
        return init_inception_v4_params(0, INCEPTION_V4)

    def test_stage_channels_and_early_abort(self, params, rng):
        x = rng.standard_normal((1, 3, 160, 160)).astype(np.float32)
        outs = inception_v4_forward(params, x, INCEPTION_V4,
                                    taps=("features.5", "features.9"))
        ch = INCEPTION_V4.feature_channels
        assert outs["features.5"].shape[1] == ch[5] == 384
        assert outs["features.9"].shape[1] == ch[9] == 384
        assert set(outs) == {"features.5", "features.9"}

    def test_deep_taps(self, params, rng):
        x = rng.standard_normal((1, 3, 160, 160)).astype(np.float32)
        outs = inception_v4_forward(params, x, INCEPTION_V4,
                                    taps=("features.17", "features.21"))
        assert outs["features.17"].shape[1] == 1024
        assert outs["features.21"].shape[1] == 1536
        assert np.isfinite(np.asarray(outs["features.21"])).all()

    def test_reductions_halve_resolution(self, params, rng):
        x = rng.standard_normal((1, 3, 160, 160)).astype(np.float32)
        outs = inception_v4_forward(params, x, INCEPTION_V4,
                                    taps=("features.9", "features.10"))
        h9 = outs["features.9"].shape[2]
        h10 = outs["features.10"].shape[2]
        assert h10 == (h9 - 1) // 2  # 3x3/s2 VALID reduction

    def test_embed_family_path(self, params, rng):
        from tpu_ac.features.embedding import EmbedConfig, embed_features

        ecfg = EmbedConfig(layers=("features.9", "features.10"),
                           pretrain_embed_dimension=32,
                           target_embed_dimension=64)
        x = rng.standard_normal((1, 3, 160, 160)).astype(np.float32)
        z = embed_features("inception_v4", params, x, INCEPTION_V4, ecfg)
        assert z.shape[0] == 1 and z.shape[2] == 64
        assert np.isfinite(np.asarray(z)).all()


class TestBNInception:
    @pytest.fixture(scope="class")
    def params(self):
        return init_bninception_params(0, BNINCEPTION)

    def test_channel_plan(self):
        ch = _bni_in_channels()
        assert ch["3a"] == 192
        assert ch["3b"] == 256
        assert ch["3c"] == 320
        assert ch["4a"] == 576
        assert ch["5a"] == 1056
        # final output (5b) = 1x1 + 3x3 + double3x3 + pool_proj widths
        from tpu_ac.models.inception import _BNI_MODULES

        c1, _cr3, c3, _crd, _cd1, cd2, cp, _s, _pool = _BNI_MODULES["5b"]
        assert c1 + c3 + cd2 + cp == 1024

    def test_forward_shapes(self, params, rng):
        x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
        outs = bninception_forward(
            params, x, BNINCEPTION,
            taps=("inception_3c", "inception_4e", "inception_5b"))
        assert outs["inception_3c"].shape == (1, 576, 8, 8)
        assert outs["inception_4e"].shape == (1, 1056, 4, 4)
        assert outs["inception_5b"].shape == (1, 1024, 4, 4)

    def test_early_abort(self, params, rng):
        x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
        outs = bninception_forward(params, x, BNINCEPTION,
                                   taps=("inception_3b",))
        assert set(outs) == {"inception_3b"}

    def test_embed_family_path(self, params, rng):
        from tpu_ac.features.embedding import EmbedConfig, embed_features

        ecfg = EmbedConfig(layers=("inception_3c", "inception_4e"),
                           pretrain_embed_dimension=32,
                           target_embed_dimension=64)
        x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
        z = embed_features("bninception", params, x, BNINCEPTION, ecfg)
        assert z.shape == (1, 64, 64)  # 8x8 ref grid


class TestResNeSt:
    @pytest.fixture(scope="class")
    def params(self):
        return init_resnest_params(0, RESNEST50D_4S2X40D)

    def test_group_widths(self):
        cfg = RESNEST50D_4S2X40D
        assert [cfg.group_width(p) for p in cfg.stage_planes] == [
            80, 160, 320, 640]
        assert cfg.stage_out_channels == (256, 512, 1024, 2048)

    def test_forward_shapes(self, params, rng):
        x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
        outs = resnest_forward(params, x, RESNEST50D_4S2X40D,
                               taps=("layer2", "layer3"))
        assert outs["layer2"].shape == (1, 512, 16, 16)
        assert outs["layer3"].shape == (1, 1024, 8, 8)

    def test_rsoftmax_matches_official_layout(self):
        """The flattened gates are radix-major (official rSoftMax: view
        (B, card, radix, c') -> transpose -> softmax(radix) -> reshape
        with NO transpose back), so chunk r of the output gates
        radix-split r: summing the radix chunks gives 1 per channel."""
        rng_ = np.random.default_rng(0)
        radix, card, c = 4, 2, 8
        x = rng_.standard_normal((3, radix * c)).astype(np.float32)
        y = np.asarray(_rsoftmax(jnp.asarray(x), radix, card))
        # radix-major: reshape (B, radix, C) and sum over radix == 1
        np.testing.assert_allclose(y.reshape(3, radix, c).sum(axis=1), 1.0,
                                   rtol=1e-5)
        # oracle: replicate the official numpy-side computation
        want = x.reshape(3, card, radix, -1).transpose(0, 2, 1, 3)
        want = np.exp(want - want.max(axis=1, keepdims=True))
        want = want / want.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(y, want.reshape(3, -1), rtol=1e-5)

    def test_split_attn_gate_actually_gates(self, params, rng):
        """Forcing fc2 output to strongly favor one split changes the
        block output — the gate is live, not a pass-through."""
        from tpu_ac.models.resnest import _split_attn_conv

        cfg = RESNEST50D_4S2X40D
        x = jnp.asarray(rng.standard_normal((1, 80, 8, 8)).astype(
            np.float32))
        a = np.asarray(_split_attn_conv(params, "layer1.0.conv2.", x, cfg,
                                        1, jax.lax.Precision.HIGHEST))
        biased = dict(params)
        bias = np.zeros((320,), np.float32)
        bias[:80] = 50.0  # favor split 0
        biased["layer1.0.conv2.fc2.bias"] = jnp.asarray(bias)
        b = np.asarray(_split_attn_conv(biased, "layer1.0.conv2.", x, cfg,
                                        1, jax.lax.Precision.HIGHEST))
        assert np.abs(a - b).max() > 1e-4
        assert a.shape == b.shape == (1, 80, 8, 8)

    def test_embed_family_path(self, params, rng):
        from tpu_ac.features.embedding import EmbedConfig, embed_features

        cfg = RESNEST50D_4S2X40D
        ecfg = EmbedConfig(layers=("layer2", "layer3"),
                           pretrain_embed_dimension=32,
                           target_embed_dimension=64)
        x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
        z = embed_features("resnest", params, x, cfg, ecfg)
        assert z.shape == (1, 256, 64)  # 16x16 ref grid


class TestRegistryBreadth:
    def test_reference_registry_names_all_resolve(self):
        """Every name in the reference's _BACKBONES dict + the dino hub
        names must resolve in our registry (backbones.py:7-50,
        hubconf.py:22-151)."""
        from tpu_ac.models.registry import BACKBONE_CONFIGS

        reference_names = [
            "alexnet", "bninception", "resnet50", "resnet101",
            "resnext101", "resnet200", "resnest50",
            "resnetv2_50_bit", "resnetv2_50_21k", "resnetv2_101_bit",
            "resnetv2_101_21k", "resnetv2_152_bit", "resnetv2_152_21k",
            "resnetv2_152_384", "resnetv2_101",
            "vgg11", "vgg19", "vgg19_bn",
            "wideresnet50", "wideresnet101",
            "mnasnet_100", "mnasnet_a1", "mnasnet_b1",
            "densenet121", "densenet201",
            "inception_v4",
            "vit_small", "vit_base", "vit_large", "vit_r50",
            "vit_deit_base", "vit_deit_distilled",
            "vit_swin_base", "vit_swin_large",
            "efficientnet_b7", "efficientnet_b5", "efficientnet_b3",
            "efficientnet_b1", "efficientnet_b3a",
            "efficientnetv2_m", "efficientnetv2_l",
            "dino_deitsmall16", "dino_deitsmall8_300ep",
            "dino_vitbase16", "dino_vitbase8",
            # dino hub (hubconf.py)
            "dino_xcit_small_12_p16", "dino_xcit_small_12_p8",
            "dino_xcit_medium_24_p16", "dino_xcit_medium_24_p8",
            "dino_resnet50",
        ]
        missing = [n for n in reference_names if n not in BACKBONE_CONFIGS]
        assert not missing, f"registry missing: {missing}"

    def test_efficientnetv2_forward_and_embed(self, rng):
        import dataclasses

        from tpu_ac.features.embedding import EmbedConfig, embed_features
        from tpu_ac.models.efficientnet import (
            EFFICIENTNETV2_M,
            efficientnetv2_forward,
            init_efficientnetv2_params,
        )

        # thin variant: 1 block per stage, same kinds/channels
        cfg = dataclasses.replace(
            EFFICIENTNETV2_M,
            stages=tuple((k, e, c, 1, s, ks, se)
                         for k, e, c, _r, s, ks, se
                         in EFFICIENTNETV2_M.stages))
        params = init_efficientnetv2_params(0, cfg)
        assert "blocks.1.0.conv_exp.weight" in params  # fused-MBConv
        assert "blocks.3.0.se.conv_reduce.weight" in params  # MBConv+SE
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        outs = efficientnetv2_forward(params, x, cfg,
                                      taps=("stage3", "stage5"))
        assert outs["stage3"].shape == (1, 80, 8, 8)
        assert outs["stage5"].shape == (1, 176, 4, 4)
        ecfg = EmbedConfig(layers=("stage3", "stage5"),
                           pretrain_embed_dimension=24,
                           target_embed_dimension=48)
        z = embed_features("efficientnetv2", params, x, cfg, ecfg)
        assert z.shape == (1, 64, 48)

    def test_deit_distilled_two_prefix_tokens(self, rng):
        import dataclasses

        from tpu_ac.features.embedding import EmbedConfig, embed_features
        from tpu_ac.models.vit import (
            ViTConfig,
            init_vit_params,
            vit_forward,
        )

        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        img_size=32, num_prefix_tokens=2)
        params = init_vit_params(0, cfg)
        assert "dist_token" in params
        assert params["pos_embed"].shape == (1, 16 + 2, 32)
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        outs = vit_forward(params, x, cfg, taps=(1,))
        assert outs[1].shape == (1, 18, 32)  # cls + dist + 4x4 grid
        ecfg = EmbedConfig(layers=("blocks.0", "blocks.1"),
                           pretrain_embed_dimension=24,
                           target_embed_dimension=48)
        z = embed_features("vit", params, x, cfg, ecfg)
        assert z.shape == (1, 16, 48)  # both prefix tokens dropped


class TestBNInceptionPoolSemantics:
    """pretrainedmodels' BNInception pools: ceil_mode max (no left pad) and
    count_include_pad=True avg — vs torch oracles."""

    def test_maxpool_ceil_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        from tpu_ac.models.inception import _maxpool_ceil

        for n in (112, 113, 28):
            x = rng.standard_normal((1, 2, n, n)).astype(np.float32)
            got = np.asarray(_maxpool_ceil(jnp.asarray(x)))
            want = F.max_pool2d(torch.from_numpy(x), 3, 2,
                                ceil_mode=True).numpy()
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_maxpool_ceil_differs_from_symmetric_pad(self, rng):
        import torch
        import torch.nn.functional as F

        from tpu_ac.models.inception import _maxpool_ceil

        x = rng.standard_normal((1, 2, 112, 112)).astype(np.float32)
        ceil = np.asarray(_maxpool_ceil(jnp.asarray(x)))
        sym = F.max_pool2d(torch.from_numpy(x), 3, 2, padding=1).numpy()
        assert ceil.shape == sym.shape  # same 56x56 ...
        assert np.abs(ceil - sym).max() > 1e-3  # ... shifted windows

    def test_avgpool_incpad_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F

        from tpu_ac.models.inception import _avgpool_3x3_s1_incpad

        x = rng.standard_normal((1, 3, 14, 14)).astype(np.float32)
        got = np.asarray(_avgpool_3x3_s1_incpad(jnp.asarray(x)))
        want = F.avg_pool2d(torch.from_numpy(x), 3, 1, 1,
                            count_include_pad=True).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
