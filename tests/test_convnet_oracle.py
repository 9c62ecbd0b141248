"""Independent naive-loop oracles for the conv-family building blocks:
EfficientNet's MBConv / DepthwiseSeparable blocks (incl. squeeze-excite
and TF-SAME asymmetric padding) and ResNetV2's weight-standardized conv +
GroupNorm.

Like tests/test_{swin,resnest,xcit}_oracle.py: float64 numpy with explicit
per-channel / per-position loops derived straight from the upstream
(timm) definitions, sharing none of the JAX implementations' vectorized
structure.  (Channel-PLAN constants still need a real checkpoint —
tests/test_manifests.py freezes those.)
"""

from __future__ import annotations

import numpy as np
import pytest


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def naive_conv(x, w, stride=1, pad=(0, 0, 0, 0), groups=1):
    """x [Cin, H, W], w [Cout, Cin/g, kh, kw]; pad = (top, bottom, l, r)."""
    cin, h, wid = x.shape
    cout, cing, kh, kw = w.shape
    t, bo, le, ri = pad
    xp = np.zeros((cin, h + t + bo, wid + le + ri))
    xp[:, t:t + h, le:le + wid] = x
    ho = (h + t + bo - kh) // stride + 1
    wo = (wid + le + ri - kw) // stride + 1
    out = np.zeros((cout, ho, wo))
    opg = cout // groups
    for o in range(cout):
        g = o // opg
        xin = xp[g * cing:(g + 1) * cing]
        for i in range(ho):
            for j in range(wo):
                out[o, i, j] = np.sum(
                    xin[:, i * stride:i * stride + kh,
                        j * stride:j * stride + kw] * w[o])
    return out


def tf_same_pad(size, k, stride):
    """TF SAME: total = max((ceil(size/s)-1)*s + k - size, 0), begin-light."""
    total = max((-(-size // stride) - 1) * stride + k - size, 0)
    return total // 2, total - total // 2


def naive_bn(x, p, name, eps):
    return ((x - p[name + ".running_mean"][:, None, None])
            / np.sqrt(p[name + ".running_var"][:, None, None] + eps)
            * p[name + ".weight"][:, None, None]
            + p[name + ".bias"][:, None, None])


def naive_se(h, p, pre):
    """timm SqueezeExcite: mean-pool -> 1x1 reduce -> silu -> 1x1 expand
    -> sigmoid gate."""
    se = h.mean(axis=(1, 2))
    wr = p[pre + "se.conv_reduce.weight"][:, :, 0, 0]
    se = _silu(wr @ se + p[pre + "se.conv_reduce.bias"])
    we = p[pre + "se.conv_expand.weight"][:, :, 0, 0]
    gate = _sigmoid(we @ se + p[pre + "se.conv_expand.bias"])
    return h * gate[:, None, None]


def _padded_conv(x, p, name, k, stride, tf_same, groups=1):
    if tf_same:
        pt, pb = tf_same_pad(x.shape[1], k, stride)
        pl, pr = tf_same_pad(x.shape[2], k, stride)
        pad = (pt, pb, pl, pr)
    else:
        pad = (k // 2,) * 4
    return naive_conv(x, p[name + ".weight"], stride=stride, pad=pad,
                      groups=groups)


def naive_efficientnet(x, p, cfg, n_stages):
    """One image [3, H, W] through the stem + first ``n_stages`` stages."""
    eps = cfg.bn_eps
    x = _silu(naive_bn(_padded_conv(x, p, "conv_stem", 3, 2, cfg.tf_same),
                       p, "bn1", eps))
    for si, (expand, _out_c, repeats, stride, k) in enumerate(cfg.stages):
        if si >= n_stages:
            break
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            s = stride if bi == 0 else 1
            identity = x
            if expand == 1:
                mid = x.shape[0]
                h = _silu(naive_bn(
                    _padded_conv(x, p, pre + "conv_dw", k, s, cfg.tf_same,
                                 groups=mid), p, pre + "bn1", eps))
                h = naive_se(h, p, pre)
                h = naive_bn(naive_conv(h, p[pre + "conv_pw.weight"]),
                             p, pre + "bn2", eps)
            else:
                h = _silu(naive_bn(
                    naive_conv(x, p[pre + "conv_pw.weight"]),
                    p, pre + "bn1", eps))
                mid = h.shape[0]
                h = _silu(naive_bn(
                    _padded_conv(h, p, pre + "conv_dw", k, s, cfg.tf_same,
                                 groups=mid), p, pre + "bn2", eps))
                h = naive_se(h, p, pre)
                h = naive_bn(naive_conv(h, p[pre + "conv_pwl.weight"]),
                             p, pre + "bn3", eps)
            if s == 1 and identity.shape[0] == h.shape[0]:
                h = h + identity
            x = h
    return x


class TestEfficientNetOracle:
    @pytest.mark.parametrize("tf_same", [True, False])
    def test_stem_and_two_stages(self, tf_same):
        import dataclasses

        from tpu_ac.models.efficientnet import EFFICIENTNET_B0, \
            efficientnet_forward, init_efficientnet_params

        cfg = dataclasses.replace(EFFICIENTNET_B0, tf_same=tf_same)
        params = init_efficientnet_params(0, cfg)
        # non-trivial BN stats so normalization is exercised
        rng = np.random.default_rng(17)
        import jax.numpy as jnp

        params = {k: (jnp.asarray(np.asarray(v)
                                  + 0.1 * rng.standard_normal(v.shape),
                                  jnp.float32)
                      if "running" in k or k.endswith(
                          ("bn1.weight", "bn2.weight", "bn3.weight"))
                      else v)
                  for k, v in params.items()}
        x = rng.standard_normal((2, 3, 33, 33)).astype(np.float32)  # odd
        got = np.asarray(efficientnet_forward(
            params, jnp.asarray(x), cfg, taps=("stage1", "stage2"))["stage2"])
        p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        want = np.stack([
            naive_efficientnet(x[i].astype(np.float64), p64, cfg, 2)
            for i in range(2)])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


class TestResNetV2Units:
    def test_std_conv_matches_naive(self):
        """Weight standardization: w' = (w - mean)/sqrt(var + eps) over
        each filter's (in, kh, kw), then a plain conv."""
        import jax.numpy as jnp

        from tpu_ac.models.resnetv2 import _std_conv

        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 4, 9, 9))
        w = rng.standard_normal((6, 4, 3, 3))
        got = np.asarray(_std_conv(jnp.asarray(x, jnp.float32),
                                   jnp.asarray(w, jnp.float32),
                                   stride=2, tf_same=True))
        w64 = w.copy()
        for o in range(6):
            f = w64[o]
            w64[o] = (f - f.mean()) / np.sqrt(f.var() + 1e-8)
        pt, pb = tf_same_pad(9, 3, 2)
        want = naive_conv(x[0], w64, stride=2, pad=(pt, pb, pt, pb))[None]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_group_norm_matches_naive(self):
        import jax.numpy as jnp

        from tpu_ac.models.resnetv2 import _gn

        rng = np.random.default_rng(3)
        c, groups = 12, 4
        x = rng.standard_normal((2, c, 5, 5))
        p = {"n.weight": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
             "n.bias": jnp.asarray(rng.standard_normal(c) * 0.1,
                                   jnp.float32)}
        got = np.asarray(_gn(p, "n", jnp.asarray(x, jnp.float32), groups,
                             1e-5))
        cpg = c // groups
        want = np.zeros_like(x)
        for b in range(2):
            for g in range(groups):
                sl = x[b, g * cpg:(g + 1) * cpg]
                want[b, g * cpg:(g + 1) * cpg] = \
                    (sl - sl.mean()) / np.sqrt(sl.var() + 1e-5)
        want = want * np.asarray(p["n.weight"])[None, :, None, None] \
            + np.asarray(p["n.bias"])[None, :, None, None]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

def naive_efficientnetv2(x, p, cfg, n_stages):
    """One image [3, H, W] through the V2 stem + first ``n_stages`` stages.

    Covers the three timm block kinds (efficientnet.py:364-369): "cn"
    ConvBnAct, "er" EdgeResidual (fused-MBConv: kxk expand conv + 1x1
    project, no depthwise/SE), and "ir" MBConv with SE sized from block
    INPUT channels.  SiLU throughout, incl. the SE reduce activation.
    """
    eps = cfg.bn_eps
    x = _silu(naive_bn(_padded_conv(x, p, "conv_stem", 3, 2, cfg.tf_same),
                       p, "bn1", eps))
    for si, (kind, _e, _oc, repeats, stride, k, se) in enumerate(cfg.stages):
        if si >= n_stages:
            break
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            s = stride if bi == 0 else 1
            identity = x
            if kind == "cn":
                h = _silu(naive_bn(
                    _padded_conv(x, p, pre + "conv", k, s, cfg.tf_same),
                    p, pre + "bn1", eps))
            elif kind == "er":
                h = _silu(naive_bn(
                    _padded_conv(x, p, pre + "conv_exp", k, s, cfg.tf_same),
                    p, pre + "bn1", eps))
                h = naive_bn(naive_conv(h, p[pre + "conv_pwl.weight"]),
                             p, pre + "bn2", eps)
            else:
                h = _silu(naive_bn(
                    naive_conv(x, p[pre + "conv_pw.weight"]),
                    p, pre + "bn1", eps))
                mid = h.shape[0]
                h = _silu(naive_bn(
                    _padded_conv(h, p, pre + "conv_dw", k, s, cfg.tf_same,
                                 groups=mid), p, pre + "bn2", eps))
                if se:
                    h = naive_se(h, p, pre)
                h = naive_bn(naive_conv(h, p[pre + "conv_pwl.weight"]),
                             p, pre + "bn3", eps)
            if s == 1 and identity.shape[0] == h.shape[0]:
                h = h + identity
            x = h
    return x


class TestEfficientNetV2Oracle:
    @pytest.mark.parametrize("tf_same", [True, False])
    def test_all_three_block_kinds(self, tf_same):
        """Tiny custom stage spec exercising cn (with residual on repeat 2),
        er, and ir+SE, against the float64 naive-loop oracle."""
        import dataclasses

        import jax.numpy as jnp

        from tpu_ac.models.efficientnet import EFFICIENTNETV2_M, \
            efficientnetv2_forward, init_efficientnetv2_params

        stages = (
            ("cn", 1, 8, 2, 1, 3, False),
            ("er", 2, 12, 2, 2, 3, False),
            ("ir", 2, 16, 2, 2, 3, True),
        )
        cfg = dataclasses.replace(EFFICIENTNETV2_M, stages=stages,
                                  stem_channels=8, tf_same=tf_same)
        params = init_efficientnetv2_params(0, cfg)
        rng = np.random.default_rng(23)
        params = {k: (jnp.asarray(np.asarray(v)
                                  + 0.1 * rng.standard_normal(v.shape),
                                  jnp.float32)
                      if "running" in k or k.endswith(
                          ("bn1.weight", "bn2.weight", "bn3.weight"))
                      else v)
                  for k, v in params.items()}
        x = rng.standard_normal((2, 3, 33, 33)).astype(np.float32)  # odd
        got = np.asarray(efficientnetv2_forward(
            params, jnp.asarray(x), cfg,
            taps=("stage1", "stage2", "stage3"))["stage3"])
        p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        want = np.stack([
            naive_efficientnetv2(x[i].astype(np.float64), p64, cfg, 3)
            for i in range(2)])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)

def naive_mnasnet(x, p, cfg, n_stages):
    """One image [3, H, W] through the MnasNet stem + first ``n_stages``
    stages (efficientnet.py:221-361): "ds" depthwise-separable first stage
    (conv_dw + conv_pw, no expansion), "ir" MBConv with per-stage SE.
    ReLU activations everywhere, incl. the SE reduce."""
    eps = cfg.bn_eps
    relu = lambda v: np.maximum(v, 0.0)
    x = relu(naive_bn(_padded_conv(x, p, "conv_stem", 3, 2, False),
                      p, "bn1", eps))
    for si, (kind, _e, _oc, repeats, stride, k, se) in enumerate(cfg.stages):
        if si >= n_stages:
            break
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            s = stride if bi == 0 else 1
            identity = x
            if kind == "ds":
                h = relu(naive_bn(
                    _padded_conv(x, p, pre + "conv_dw", k, s, False,
                                 groups=x.shape[0]), p, pre + "bn1", eps))
                h = naive_bn(naive_conv(h, p[pre + "conv_pw.weight"]),
                             p, pre + "bn2", eps)
            else:
                h = relu(naive_bn(
                    naive_conv(x, p[pre + "conv_pw.weight"]),
                    p, pre + "bn1", eps))
                mid = h.shape[0]
                h = relu(naive_bn(
                    _padded_conv(h, p, pre + "conv_dw", k, s, False,
                                 groups=mid), p, pre + "bn2", eps))
                if se:
                    sq = h.mean(axis=(1, 2))
                    wr = p[pre + "se.conv_reduce.weight"][:, :, 0, 0]
                    sq = relu(wr @ sq + p[pre + "se.conv_reduce.bias"])
                    we = p[pre + "se.conv_expand.weight"][:, :, 0, 0]
                    gate = _sigmoid(we @ sq + p[pre + "se.conv_expand.bias"])
                    h = h * gate[:, None, None]
                h = naive_bn(naive_conv(h, p[pre + "conv_pwl.weight"]),
                             p, pre + "bn3", eps)
            if s == 1 and identity.shape[0] == h.shape[0]:
                h = h + identity
            x = h
    return x


class TestMnasNetOracle:
    def test_ds_and_ir_se_blocks(self):
        """Tiny custom spec exercising ds, ir (5x5 kernel), and ir+SE
        against the float64 naive-loop oracle."""
        import dataclasses

        import jax.numpy as jnp

        from tpu_ac.models.efficientnet import MNASNET_B1, \
            init_mnasnet_params, mnasnet_forward

        stages = (
            ("ds", 1, 8, 1, 1, 3, False),
            ("ir", 3, 12, 2, 2, 5, False),
            ("ir", 2, 16, 2, 2, 3, True),
        )
        cfg = dataclasses.replace(MNASNET_B1, stages=stages, stem_channels=8)
        params = init_mnasnet_params(0, cfg)
        rng = np.random.default_rng(29)
        params = {k: (jnp.asarray(np.asarray(v)
                                  + 0.1 * rng.standard_normal(v.shape),
                                  jnp.float32)
                      if "running" in k or k.endswith(
                          ("bn1.weight", "bn2.weight", "bn3.weight"))
                      else v)
                  for k, v in params.items()}
        x = rng.standard_normal((2, 3, 33, 33)).astype(np.float32)  # odd
        got = np.asarray(mnasnet_forward(
            params, jnp.asarray(x), cfg,
            taps=("stage1", "stage2", "stage3"))["stage3"])
        p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        want = np.stack([
            naive_mnasnet(x[i].astype(np.float64), p64, cfg, 3)
            for i in range(2)])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
