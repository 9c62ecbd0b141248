"""ResNet backbone parity vs torch oracle + resnet embedding path."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ac.models.resnet import (
    ResNetConfig,
    init_resnet_params,
    resnet_forward,
    resnet_classify,
)
from tests.torch_ref import torch_resnet_forward

# A tiny bottleneck net in the same shape family (block counts shrunk)
TINY = ResNetConfig(block_counts=(1, 1, 1, 1), width_per_group=16,
                    num_classes=10)


@pytest.fixture(scope="module")
def tiny_params():
    p = init_resnet_params(0, TINY)
    # non-trivial BN stats so the BN math is actually exercised
    rng = np.random.default_rng(1)
    out = {}
    for k, v in p.items():
        if k.endswith("running_mean"):
            out[k] = jnp.asarray(rng.standard_normal(v.shape).astype(np.float32) * 0.1)
        elif k.endswith("running_var"):
            out[k] = jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
        else:
            out[k] = v
    return out


class TestResNetParity:
    def test_taps_match_torch(self, tiny_params, rng):
        imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        got = resnet_forward(tiny_params, jnp.asarray(imgs), TINY,
                             taps=("layer2", "layer3"))
        want = torch_resnet_forward(tiny_params, imgs, TINY,
                                    taps=("layer2", "layer3"))
        for k in ("layer2", "layer3"):
            assert got[k].shape == want[k].shape
            np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                       rtol=5e-4, atol=5e-5)

    def test_stage_shapes(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
        outs = resnet_forward(tiny_params, imgs, TINY,
                              taps=("layer1", "layer2", "layer3", "layer4"))
        # 64 -> conv1/pool -> 16 -> strides halve per later stage
        assert outs["layer1"].shape == (1, 64 * 4, 16, 16)
        assert outs["layer2"].shape == (1, 128 * 4, 8, 8)
        assert outs["layer3"].shape == (1, 256 * 4, 4, 4)
        assert outs["layer4"].shape == (1, 512 * 4, 2, 2)

    def test_early_abort(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
        outs = resnet_forward(tiny_params, imgs, TINY, taps=("layer1",))
        assert set(outs) == {"layer1"}

    def test_classify_shape(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
        logits = resnet_classify(tiny_params, imgs, TINY)
        assert logits.shape == (2, 10)

    def test_wideresnet_widths(self):
        from tpu_ac.models.resnet import WIDE_RESNET50_2
        p = init_resnet_params(0, WIDE_RESNET50_2)
        # wide: inner conv width doubles, stage output channels unchanged
        assert p["layer1.0.conv1.weight"].shape == (128, 64, 1, 1)
        assert p["layer1.0.conv3.weight"].shape == (256, 128, 1, 1)
        assert p["layer4.2.conv3.weight"].shape == (2048, 1024, 1, 1)


class TestResNetEmbedding:
    def test_multiscale_embed(self, tiny_params, rng):
        """layer2+layer3 have different grids — exercises bilinear align."""
        from tpu_ac.features import EmbedConfig, embed_resnet_features

        cfg = EmbedConfig(layers=("layer2", "layer3"),
                          pretrain_embed_dimension=64,
                          target_embed_dimension=128,
                          apply_layernorm=False)
        imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
        z = embed_resnet_features(tiny_params, imgs, TINY, cfg)
        assert z.shape == (2, 8 * 8, 128)  # layer2 grid is the reference

    def test_matches_torch_tail(self, tiny_params, rng):
        from tpu_ac.features import EmbedConfig, embed_resnet_features
        from tests.torch_ref import torch_embed_pipeline
        import torch
        import torch.nn.functional as F

        cfg = EmbedConfig(layers=("layer2",), pretrain_embed_dimension=64,
                          target_embed_dimension=64, apply_layernorm=True)
        imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        got = np.asarray(
            embed_resnet_features(tiny_params, jnp.asarray(imgs), TINY, cfg))

        feat = torch_resnet_forward(tiny_params, imgs, TINY, taps=("layer2",))
        f = torch.from_numpy(feat["layer2"])
        ln = torch.nn.LayerNorm(list(f.shape[1:]))
        with torch.no_grad():
            f = ln(f)
        unfolder = torch.nn.Unfold(kernel_size=3, stride=1, padding=1)
        u = unfolder(f).reshape(*f.shape[:2], 3, 3, -1).permute(0, 4, 1, 2, 3)
        b, p = u.shape[:2]
        pooled = F.adaptive_avg_pool1d(u.reshape(b * p, 1, -1), 64).squeeze(1)
        want = F.adaptive_avg_pool1d(pooled.reshape(b * p, 1, -1), 64)
        want = want.reshape(b, p, 64).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_registry_resnet(self):
        from tpu_ac.models import load_backbone
        params, cfg, family = load_backbone("wideresnet50")
        assert family == "resnet"
        assert params["layer1.0.conv1.weight"].shape == (128, 64, 1, 1)


class TestBlockVariants:
    def test_basic_block_resnet18(self, rng):
        from tpu_ac.models.resnet import RESNET18, init_resnet_params, resnet_forward
        import dataclasses
        tiny = dataclasses.replace(RESNET18, block_counts=(1, 1, 1, 1))
        p = init_resnet_params(0, tiny)
        assert p["layer1.0.conv1.weight"].shape == (64, 64, 3, 3)
        assert "layer1.0.conv3.weight" not in p
        assert "layer1.0.downsample.0.weight" not in p  # no down at stage 1
        assert "layer2.0.downsample.0.weight" in p
        imgs = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
        outs = resnet_forward(p, imgs, tiny, taps=("layer2", "layer4"))
        assert outs["layer2"].shape == (1, 128, 8, 8)
        assert outs["layer4"].shape == (1, 512, 2, 2)

    def test_basic_block_matches_torch(self, rng):
        import dataclasses
        from tpu_ac.models.resnet import RESNET18, init_resnet_params, resnet_forward
        import torch
        import torch.nn.functional as F

        tiny = dataclasses.replace(RESNET18, block_counts=(1, 1, 1, 1))
        p = init_resnet_params(0, tiny)
        imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        got = np.asarray(resnet_forward(p, jnp.asarray(imgs), tiny,
                                        taps=("layer2",))["layer2"])

        def conv(x, name, stride=1, padding=0):
            return F.conv2d(x, torch.from_numpy(np.asarray(p[name + ".weight"])),
                            stride=stride, padding=padding)

        def bn(x, name):
            return F.batch_norm(
                x, torch.from_numpy(np.asarray(p[name + ".running_mean"])),
                torch.from_numpy(np.asarray(p[name + ".running_var"])),
                torch.from_numpy(np.asarray(p[name + ".weight"])),
                torch.from_numpy(np.asarray(p[name + ".bias"])),
                training=False, eps=1e-5)

        x = F.relu(bn(conv(torch.from_numpy(imgs), "conv1", 2, 3), "bn1"))
        x = F.max_pool2d(x, 3, 2, 1)
        for li, stage in enumerate(("layer1", "layer2")):
            pre = f"{stage}.0."
            stride = 1 if li == 0 else 2
            idn = x
            out = F.relu(bn(conv(x, pre + "conv1", stride, 1), pre + "bn1"))
            out = bn(conv(out, pre + "conv2", 1, 1), pre + "bn2")
            if pre + "downsample.0.weight" in p:
                idn = bn(conv(x, pre + "downsample.0", stride), pre + "downsample.1")
            x = F.relu(out + idn)
        np.testing.assert_allclose(got, x.numpy(), rtol=5e-4, atol=5e-5)

    def test_resnext_grouped_conv(self, rng):
        import dataclasses
        from tpu_ac.models.resnet import RESNEXT101_32X8D, init_resnet_params, resnet_forward
        tiny = dataclasses.replace(RESNEXT101_32X8D, block_counts=(1, 1, 1, 1))
        p = init_resnet_params(0, tiny)
        # width = 64 * 8/64 * 32 = 256; grouped conv2 has in/groups = 8
        assert p["layer1.0.conv1.weight"].shape == (256, 64, 1, 1)
        assert p["layer1.0.conv2.weight"].shape == (256, 8, 3, 3)
        imgs = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
        outs = resnet_forward(p, imgs, tiny, taps=("layer1",))
        assert outs["layer1"].shape == (1, 256, 16, 16)


class TestDenseNet:
    def test_densenet_tiny_matches_torch(self, rng):
        import dataclasses
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.densenet import (DenseNetConfig,
                                            init_densenet_params,
                                            densenet_forward)

        tiny = DenseNetConfig(block_config=(2, 2), growth_rate=8,
                              num_init_features=16, bn_size=2)
        p = init_densenet_params(0, tiny)
        imgs = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        got = densenet_forward(p, jnp.asarray(imgs), tiny,
                               taps=("denseblock1", "denseblock2"))

        def conv(x, name, stride=1, padding=0):
            return F.conv2d(x, torch.from_numpy(np.asarray(p[name + ".weight"])),
                            stride=stride, padding=padding)

        def bnr(x, name):
            return F.relu(F.batch_norm(
                x, torch.from_numpy(np.asarray(p[name + ".running_mean"])),
                torch.from_numpy(np.asarray(p[name + ".running_var"])),
                torch.from_numpy(np.asarray(p[name + ".weight"])),
                torch.from_numpy(np.asarray(p[name + ".bias"])),
                training=False, eps=1e-5))

        x = conv(torch.from_numpy(imgs), "features.conv0", 2, 3)
        x = bnr(x, "features.norm0")
        x = F.max_pool2d(x, 3, 2, 1)
        outs = {}
        for bi, n_layers in enumerate(tiny.block_config, start=1):
            for li in range(1, n_layers + 1):
                pre = f"features.denseblock{bi}.denselayer{li}."
                h = bnr(x, pre + "norm1")
                h = conv(h, pre + "conv1")
                h = bnr(h, pre + "norm2")
                h = conv(h, pre + "conv2", padding=1)
                x = torch.cat([x, h], 1)
            outs[f"denseblock{bi}"] = x.numpy()
            if bi != len(tiny.block_config):
                pre = f"features.transition{bi}."
                x = bnr(x, pre + "norm")
                x = conv(x, pre + "conv")
                x = F.avg_pool2d(x, 2, 2)
        for k in ("denseblock1", "denseblock2"):
            np.testing.assert_allclose(np.asarray(got[k]), outs[k],
                                       rtol=5e-4, atol=5e-5)

    def test_densenet201_registry_and_embed(self, rng):
        from tpu_ac.models import load_backbone
        from tpu_ac.features.embedding import EmbedConfig, embed_densenet_features
        import dataclasses
        params, cfg, family = load_backbone("densenet121")
        assert family == "densenet"
        # shrink for test speed
        from tpu_ac.models.densenet import DenseNetConfig, init_densenet_params
        tiny = DenseNetConfig(block_config=(2, 2, 2), growth_rate=8,
                              num_init_features=16, bn_size=2)
        p = init_densenet_params(0, tiny)
        ecfg = EmbedConfig(layers=("denseblock2", "denseblock3"),
                           pretrain_embed_dimension=32,
                           target_embed_dimension=64, apply_layernorm=False)
        imgs = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
        z = embed_densenet_features(p, imgs, tiny, ecfg)
        assert z.shape == (2, 8 * 8, 64)  # denseblock2 grid (64/8) reference


class TestVGG:
    def test_vgg_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.vgg import VGG11, init_vgg_params, vgg_forward

        p = init_vgg_params(0, VGG11)
        imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        got = vgg_forward(p, jnp.asarray(imgs), VGG11,
                          taps=("stage2", "stage3"))

        x = torch.from_numpy(imgs)
        stage = 1
        outs = {}
        from tpu_ac.models.vgg import _sequential_indices
        for idx, kind, _ in _sequential_indices(VGG11):
            if kind == "conv":
                x = F.conv2d(x, torch.from_numpy(np.asarray(p[f"features.{idx}.weight"])),
                             torch.from_numpy(np.asarray(p[f"features.{idx}.bias"])),
                             padding=1)
            elif kind == "relu":
                x = F.relu(x)
            elif kind == "pool":
                outs[f"stage{stage}"] = x.numpy()
                x = F.max_pool2d(x, 2, 2)
                stage += 1
        for k in ("stage2", "stage3"):
            np.testing.assert_allclose(np.asarray(got[k]), outs[k],
                                       rtol=5e-4, atol=5e-5)

    def test_vgg_bn_registry_and_embed(self, rng):
        from tpu_ac.models import load_backbone
        from tpu_ac.features.embedding import EmbedConfig, embed_vgg_features
        from tpu_ac.models.vgg import VGG19_BN, init_vgg_params

        _p, cfg, family = load_backbone("vgg19_bn")
        assert family == "vgg" and cfg.batch_norm
        p = init_vgg_params(0, VGG19_BN)
        ecfg = EmbedConfig(layers=("stage3", "stage4"),
                           pretrain_embed_dimension=64,
                           target_embed_dimension=128,
                           apply_layernorm=False)
        imgs = jnp.asarray(rng.standard_normal((1, 3, 64, 64)).astype(np.float32))
        z = embed_vgg_features(p, imgs, VGG19_BN, ecfg)
        assert z.shape == (1, 16 * 16, 128)  # stage3 grid = 64/4


class TestAlexNet:
    def test_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.vgg import (ALEXNET, _ALEXNET_CONVS,
                                       _ALEXNET_POOL_AFTER,
                                       alexnet_forward, init_alexnet_params)

        p = init_alexnet_params(0)
        imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        got = alexnet_forward(p, jnp.asarray(imgs), ALEXNET,
                              taps=("conv3", "conv5"))
        x = torch.from_numpy(imgs)
        outs = {}
        for n, (idx, _o, _i, _k, stride, pad) in enumerate(_ALEXNET_CONVS, 1):
            x = F.conv2d(x, torch.from_numpy(np.asarray(p[f"features.{idx}.weight"])),
                         torch.from_numpy(np.asarray(p[f"features.{idx}.bias"])),
                         stride=stride, padding=pad)
            x = F.relu(x)
            outs[f"conv{n}"] = x.numpy()
            if idx in _ALEXNET_POOL_AFTER and n < 5:
                x = F.max_pool2d(x, 3, 2)
        for k in ("conv3", "conv5"):
            np.testing.assert_allclose(np.asarray(got[k]), outs[k],
                                       rtol=5e-4, atol=5e-5)

    def test_registry(self):
        from tpu_ac.models import load_backbone
        p, cfg, family = load_backbone("alexnet")
        assert family == "alexnet"
        assert p["features.0.weight"].shape == (64, 3, 11, 11)


class TestEfficientNet:
    def test_b0_matches_torch(self, rng):
        """MBConv block semantics vs a torch re-evaluation of the same
        params (depthwise conv, SE, skip)."""
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.efficientnet import (
            EfficientNetConfig, efficientnet_forward, init_efficientnet_params)

        cfg = EfficientNetConfig(tf_same=False)  # native symmetric padding
        p = init_efficientnet_params(0, cfg)
        imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        got = efficientnet_forward(p, jnp.asarray(imgs), cfg,
                                   taps=("stage2",))["stage2"]

        def t(k):
            return torch.from_numpy(np.asarray(p[k]))

        def bn(x, name):
            return F.batch_norm(x, t(name + ".running_mean"),
                                t(name + ".running_var"), t(name + ".weight"),
                                t(name + ".bias"), training=False, eps=1e-3)

        x = F.silu(bn(F.conv2d(torch.from_numpy(imgs), t("conv_stem.weight"),
                               stride=2, padding=1), "bn1"))
        def se_gate(h, pre):
            se = h.mean((2, 3), keepdim=True)
            se = F.silu(F.conv2d(se, t(pre + "se.conv_reduce.weight"),
                                 t(pre + "se.conv_reduce.bias")))
            return torch.sigmoid(
                F.conv2d(se, t(pre + "se.conv_expand.weight"),
                         t(pre + "se.conv_expand.bias")))

        for si, (expand, _oc, repeats, stride, k) in enumerate(cfg.stages[:2]):
            for bi in range(repeats):
                pre = f"blocks.{si}.{bi}."
                s = stride if bi == 0 else 1
                idn = x
                h = x
                if expand == 1:
                    # timm DepthwiseSeparableConv: dw/bn1 -> se -> pw/bn2
                    mid = h.shape[1]
                    h = F.silu(bn(F.conv2d(h, t(pre + "conv_dw.weight"),
                                           stride=s, padding=k // 2,
                                           groups=mid), pre + "bn1"))
                    h = h * se_gate(h, pre)
                    h = bn(F.conv2d(h, t(pre + "conv_pw.weight")),
                           pre + "bn2")
                else:
                    h = F.silu(bn(F.conv2d(h, t(pre + "conv_pw.weight")),
                                  pre + "bn1"))
                    mid = h.shape[1]
                    h = F.silu(bn(F.conv2d(h, t(pre + "conv_dw.weight"),
                                           stride=s, padding=k // 2,
                                           groups=mid), pre + "bn2"))
                    h = h * se_gate(h, pre)
                    h = bn(F.conv2d(h, t(pre + "conv_pwl.weight")),
                           pre + "bn3")
                if s == 1 and idn.shape[1] == h.shape[1]:
                    h = h + idn
                x = h
        np.testing.assert_allclose(np.asarray(got), x.numpy(),
                                   rtol=5e-4, atol=5e-5)

    def test_variant_scaling(self):
        from tpu_ac.models.efficientnet import EFFICIENTNET_B7
        st = EFFICIENTNET_B7.stages
        assert EFFICIENTNET_B7.stem_channels == 64
        assert st[1][1] == 48 and st[1][2] == 7  # 24*2.0, ceil(2*3.1)

    def test_tf_same_padding_matches_torch_oracle(self, rng):
        """The registered b1..b7/v2 are timm tf_ ports: strided convs use
        TensorFlow SAME padding (asymmetric, bottom/right-heavy) — checked
        against torch F.pad + conv, and shown to differ from symmetric."""
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.efficientnet import _conv, _same_pads

        assert _same_pads(64, 3, 2) == (0, 1)
        assert _same_pads(64, 5, 2) == (1, 2)
        assert _same_pads(63, 3, 2) == (1, 1)
        assert _same_pads(64, 3, 1) == (1, 1)  # stride 1 == symmetric

        x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
        w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
        got = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w), stride=2,
                               tf_same=True))
        xt = F.pad(torch.from_numpy(x), (0, 1, 0, 1))  # (l, r, t, b)
        want = F.conv2d(xt, torch.from_numpy(w), stride=2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        sym = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w), stride=2,
                               padding=1))
        assert np.abs(got - sym).max() > 1e-3

    def test_b3a_is_native_padded(self):
        from tpu_ac.models.registry import BACKBONE_CONFIGS

        assert BACKBONE_CONFIGS["efficientnet_b1"].config.tf_same
        assert not BACKBONE_CONFIGS["efficientnet_b3a"].config.tf_same
        assert BACKBONE_CONFIGS["efficientnetv2_m"].config.tf_same

    def test_registry(self):
        from tpu_ac.models import load_backbone
        p, cfg, family = load_backbone("efficientnet_b1")
        assert family == "efficientnet"
        assert "blocks.6.1.conv_dw.weight" in p  # depth_mult 1.1 -> 2 blocks


class TestResNetV2:
    def test_bit_block_matches_torch(self):
        """Weight-standardized conv + GroupNorm preact bottleneck vs torch."""
        import dataclasses
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.resnetv2 import (ResNetV2Config,
                                            init_resnetv2_params,
                                            resnetv2_forward)

        tiny = ResNetV2Config(block_counts=(1, 1), width_factor=1,
                              gn_groups=8)
        p = init_resnetv2_params(0, tiny)
        # hermetic rng: weight standardization divides by per-filter std,
        # amplifying f32 noise for unlucky shared-fixture draws
        imgs = np.random.default_rng(11).standard_normal(
            (1, 3, 64, 64)).astype(np.float32)
        got = resnetv2_forward(p, jnp.asarray(imgs), tiny,
                               taps=("stage1", "stage2"))

        def t(k):
            return torch.from_numpy(np.asarray(p[k]))

        def std_conv(x, name, stride=1, padding=0):
            w = t(name + ".weight")
            m = w.mean((1, 2, 3), keepdim=True)
            v = w.var((1, 2, 3), unbiased=False, keepdim=True)
            w = (w - m) / torch.sqrt(v + 1e-8)
            return F.conv2d(x, w, stride=stride, padding=padding)

        def gn_relu(x, name):
            return F.relu(F.group_norm(x, 8, t(name + ".weight"),
                                       t(name + ".bias"), eps=1e-5))

        x = std_conv(torch.from_numpy(imgs), "stem.conv", 2, 3)
        # BiT 'fixed' stem: zero-pad then UNpadded pool (ConstantPad2d(1,0)
        # + MaxPool2d(3,2)) — zeros, not -inf, at the borders
        x = F.max_pool2d(F.pad(x, (1, 1, 1, 1)), 3, 2)
        outs = {}
        for si in range(2):
            stride = 1 if si == 0 else 2
            pre = f"stages.{si}.blocks.0."
            pa = gn_relu(x, pre + "norm1")
            sc = std_conv(pa, pre + "downsample.conv", stride)
            h = std_conv(pa, pre + "conv1")
            h = gn_relu(h, pre + "norm2")
            h = std_conv(h, pre + "conv2", stride, 1)
            h = gn_relu(h, pre + "norm3")
            h = std_conv(h, pre + "conv3")
            x = h + sc
            outs[f"stage{si + 1}"] = x.numpy()
        for k in ("stage1", "stage2"):
            np.testing.assert_allclose(np.asarray(got[k]), outs[k],
                                       rtol=1e-2, atol=5e-4)

    def test_registry_bit(self):
        from tpu_ac.models import load_backbone
        p, cfg, family = load_backbone("resnetv2_50_bit")
        assert family == "resnetv2" and cfg.width_factor == 3
        assert p["stem.conv.weight"].shape == (192, 3, 7, 7)

    def test_plain_resnetv2_101_is_batchnorm(self):
        """timm's PLAIN resnetv2_101 is BatchNormAct + ordinary convs, not
        the BiT GN+weight-standardized recipe — its checkpoint carries
        running stats the forward must consume."""
        from tpu_ac.models import load_backbone
        from tpu_ac.models.registry import BACKBONE_CONFIGS

        cfg = BACKBONE_CONFIGS["resnetv2_101"].config
        assert cfg.norm == "bn" and not cfg.std_conv
        assert cfg.stem_pool == "standard"
        p, _, _ = load_backbone("resnetv2_101")
        assert "stages.0.blocks.0.norm1.running_mean" in p
        bit = BACKBONE_CONFIGS["resnetv2_50_bit"].config
        assert bit.norm == "gn" and bit.std_conv

    def test_plain_bn_block_matches_torch(self, rng):
        """Pre-act BN bottleneck (plain resnetv2) vs torch."""
        import torch
        import torch.nn.functional as F
        from tpu_ac.models.resnetv2 import (ResNetV2Config,
                                            init_resnetv2_params,
                                            resnetv2_forward)

        tiny = ResNetV2Config(block_counts=(1,), norm="bn", std_conv=False,
                              stem_pool="standard")
        p = init_resnetv2_params(0, tiny)
        # nontrivial running stats to exercise the BN path
        p = {k: (jnp.asarray(np.random.default_rng(3).uniform(
                 0.5, 1.5, v.shape).astype(np.float32))
                 if k.endswith("running_var") else v)
             for k, v in p.items()}
        imgs = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        got = resnetv2_forward(p, jnp.asarray(imgs), tiny,
                               taps=("stage1",))["stage1"]

        def t(k):
            return torch.from_numpy(np.asarray(p[k]))

        def bn_relu(x, name, relu=True):
            y = F.batch_norm(x, t(name + ".running_mean"),
                             t(name + ".running_var"), t(name + ".weight"),
                             t(name + ".bias"), training=False, eps=1e-5)
            return F.relu(y) if relu else y

        x = F.conv2d(torch.from_numpy(imgs), t("stem.conv.weight"),
                     stride=2, padding=3)
        x = F.max_pool2d(x, 3, 2, 1)
        pre = "stages.0.blocks.0."
        pa = bn_relu(x, pre + "norm1")
        sc = F.conv2d(pa, t(pre + "downsample.conv.weight"))
        h = F.conv2d(pa, t(pre + "conv1.weight"))
        h = bn_relu(h, pre + "norm2")
        h = F.conv2d(h, t(pre + "conv2.weight"), padding=1)
        h = bn_relu(h, pre + "norm3")
        h = F.conv2d(h, t(pre + "conv3.weight"))
        want = (h + sc).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-5)


class TestMnasNet:
    def test_forward_and_registry(self):
        import jax.numpy as jnp
        from tpu_ac.models import load_backbone
        from tpu_ac.models.efficientnet import mnasnet_forward

        for name in ("mnasnet_b1", "mnasnet_a1", "mnasnet_100"):
            p, cfg, family = load_backbone(name)
            assert family == "mnasnet"
            out = mnasnet_forward(p, jnp.zeros((1, 3, 64, 64)), cfg,
                                  taps=("stage2", "stage4"))
            assert out["stage2"].shape[1] == 24
            assert out["stage4"].shape[1] == 80

    def test_a1_has_se_b1_does_not(self):
        from tpu_ac.models import load_backbone
        p_a1, _, _ = load_backbone("mnasnet_a1")
        p_b1, _, _ = load_backbone("mnasnet_b1")
        assert any("se.conv_reduce" in k for k in p_a1)
        assert not any("se.conv_reduce" in k for k in p_b1)


class TestBottleneckTrainableResNet:
    """RESNET50_IMAGENET (trainable-BN bottleneck, models/resnet_cifar.py)
    must agree in eval mode with the independent inference ResNet-50
    (models/resnet.py) on shared torchvision-layout weights."""

    def test_eval_matches_inference_resnet50(self, rng):
        from tpu_ac.models.resnet import RESNET50, resnet_forward
        from tpu_ac.models.resnet_cifar import (
            RESNET50_IMAGENET,
            cifar_resnet_forward,
            init_cifar_resnet,
        )

        import dataclasses
        # one block per stage, real resnet50 widths (the inference config
        # hard-wires the 64/128/256/512 ladder)
        tcfg = dataclasses.replace(RESNET50_IMAGENET,
                                   block_counts=(1, 1, 1, 1))
        params, bn_state = init_cifar_resnet(0, tcfg)
        # randomize BN stats so eval mode actually uses them
        bn_state = {k: jnp.asarray(
            rng.standard_normal(v.shape).astype(np.float32) * 0.1
            + (1.0 if "var" in k else 0.0))
            for k, v in bn_state.items()}
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        feats, new_state = cifar_resnet_forward(params, bn_state, x, tcfg,
                                                train=False)
        # inference model takes one merged dict and the same key names
        icfg = dataclasses.replace(RESNET50, block_counts=(1, 1, 1, 1))
        merged = {**params, **bn_state}
        out = resnet_forward(merged, x, icfg, taps=("layer4",))
        want = jnp.mean(out["layer4"], axis=(2, 3))
        np.testing.assert_allclose(np.asarray(feats), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        # eval mode must not touch running stats
        for k in bn_state:
            np.testing.assert_array_equal(np.asarray(new_state[k]),
                                          np.asarray(bn_state[k]))

    def test_train_mode_updates_stats_and_shapes(self, rng):
        from tpu_ac.models.resnet_cifar import (
            RESNET50_IMAGENET,
            cifar_resnet_forward,
            init_cifar_resnet,
        )
        import dataclasses

        tcfg = dataclasses.replace(RESNET50_IMAGENET,
                                   block_counts=(1, 1, 1, 1),
                                   widths=(4, 8, 8, 8))
        params, bn_state = init_cifar_resnet(0, tcfg)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        feats, new_state = cifar_resnet_forward(params, bn_state, x, tcfg,
                                                train=True)
        assert feats.shape == (2, tcfg.feature_dim)
        assert tcfg.feature_dim == 8 * 4
        changed = [k for k in bn_state
                   if not np.allclose(np.asarray(new_state[k]),
                                      np.asarray(bn_state[k]))]
        assert changed, "train mode must update running stats"
        assert any(k.endswith("downsample.1.running_mean")
                   for k in bn_state), "torchvision downsample names"

    def test_moco_remap_loads(self, rng):
        """A moco-style checkpoint remaps onto RESNET50_IMAGENET keys
        (moco.py:64-88 -> convert.moco_to_contrastive_params)."""
        import dataclasses
        import torch

        from tpu_ac.models.convert import moco_to_contrastive_params
        from tpu_ac.models.resnet_cifar import (
            RESNET50_IMAGENET,
            init_cifar_resnet,
        )

        tcfg = dataclasses.replace(RESNET50_IMAGENET,
                                   block_counts=(1, 1, 1, 1),
                                   widths=(4, 4, 4, 4))
        params, bn_state = init_cifar_resnet(0, tcfg)
        fake = {}
        for k, v in {**params, **bn_state}.items():
            fake["module.encoder_q." + k] = torch.from_numpy(
                np.asarray(v))
        d = tcfg.feature_dim
        fake["module.encoder_q.fc.0.weight"] = torch.zeros((d, d))
        fake["module.encoder_q.fc.0.bias"] = torch.zeros((d,))
        fake["module.encoder_q.fc.2.weight"] = torch.zeros((128, d))
        fake["module.encoder_q.fc.2.bias"] = torch.zeros((128,))
        remapped = moco_to_contrastive_params(fake)
        got_backbone = {k: v for k, v in remapped.items()
                        if not k.startswith("contrastive_head.")}
        assert set(got_backbone) == set({**params, **bn_state})
        assert "contrastive_head.0.weight" in remapped
        assert "contrastive_head.2.weight" in remapped
