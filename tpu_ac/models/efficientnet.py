"""EfficientNet B0-B7 (inference mode), timm-checkpoint-compatible.

The reference registry resolves tf_efficientnet_b1/b3/b5/b7 via timm
(backbones.py:43-49).  Parameters keep timm's state_dict names
(``conv_stem.weight``, ``blocks.<stage>.<block>.conv_pw/.conv_dw/
.se.conv_reduce/.se.conv_expand/.conv_pwl`` with bn1/bn2/bn3) so released
checkpoints convert by array copy.

MBConv = expand 1x1 -> depthwise kxk (grouped conv, feature_group_count =
channels) -> squeeze-excite -> project 1x1, SiLU activations, identity
skip at stride 1 / equal channels.  Taps: ``stage1`` ... ``stage7``
(per-stage block outputs) for multi-scale feature use.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.pooling import tf_same_pads as _same_pads

Params = Mapping[str, jnp.ndarray]

# base B0 stage layout: (expand_ratio, channels, repeats, stride, kernel)
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_channels(c: float, divisor: int = 8) -> int:
    """timm/tf channel rounding."""
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    width_mult: float = 1.0
    depth_mult: float = 1.0
    bn_eps: float = 1e-3  # tf variants use eps=1e-3
    se_ratio: float = 0.25
    # the registered b1/b3/b5/b7 are timm tf_ ports trained with
    # TensorFlow SAME padding: strided convs pad asymmetrically
    # (bottom/right-heavy), unlike the symmetric k//2 of native variants
    tf_same: bool = True

    @property
    def stem_channels(self) -> int:
        return _round_channels(32 * self.width_mult)

    @property
    def stages(self):
        out = []
        for expand, c, repeats, stride, k in _B0_STAGES:
            out.append((expand, _round_channels(c * self.width_mult),
                        int(math.ceil(repeats * self.depth_mult)), stride, k))
        return tuple(out)


EFFICIENTNET_B0 = EfficientNetConfig()
EFFICIENTNET_B1 = EfficientNetConfig(1.0, 1.1)
EFFICIENTNET_B3 = EfficientNetConfig(1.2, 1.4)
EFFICIENTNET_B5 = EfficientNetConfig(1.6, 2.2)
EFFICIENTNET_B7 = EfficientNetConfig(2.0, 3.1)


def init_efficientnet_params(seed: int, cfg: EfficientNetConfig
                             ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k, groups=1):
        fan = (in_c // groups) * k * k
        p[name + ".weight"] = (
            rng.standard_normal((out_c, in_c // groups, k, k))
            * math.sqrt(2.0 / fan)).astype(np.float32)

    def conv_b(name, out_c, in_c, k):
        conv(name, out_c, in_c, k)
        p[name + ".bias"] = np.zeros((out_c,), np.float32)

    def bn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        p[name + ".running_mean"] = np.zeros((c,), np.float32)
        p[name + ".running_var"] = np.ones((c,), np.float32)

    conv("conv_stem", cfg.stem_channels, 3, 3)
    bn("bn1", cfg.stem_channels)
    in_c = cfg.stem_channels
    for si, (expand, out_c, repeats, _stride, k) in enumerate(cfg.stages):
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            mid = in_c * expand
            se_c = max(1, int(in_c * cfg.se_ratio))
            if expand == 1:
                # timm DepthwiseSeparableConv layout (stage 0):
                # conv_dw/bn1 -> se -> conv_pw/bn2 (no expansion, no pwl)
                conv(pre + "conv_dw", mid, mid, k, groups=mid)
                bn(pre + "bn1", mid)
                conv_b(pre + "se.conv_reduce", se_c, mid, 1)
                conv_b(pre + "se.conv_expand", mid, se_c, 1)
                conv(pre + "conv_pw", out_c, mid, 1)
                bn(pre + "bn2", out_c)
            else:
                conv(pre + "conv_pw", mid, in_c, 1)
                bn(pre + "bn1", mid)
                conv(pre + "conv_dw", mid, mid, k, groups=mid)
                bn(pre + "bn2", mid)
                conv_b(pre + "se.conv_reduce", se_c, mid, 1)
                conv_b(pre + "se.conv_expand", mid, se_c, 1)
                conv(pre + "conv_pwl", out_c, mid, 1)
                bn(pre + "bn3", out_c)
            in_c = out_c
    return {k2: jnp.asarray(v) for k2, v in p.items()}




def _conv(x, w, stride=1, padding=0, groups=1, tf_same=False):
    if tf_same:
        k = w.shape[2]
        pads = (_same_pads(x.shape[2], k, stride),
                _same_pads(x.shape[3], k, stride))
    else:
        pads = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pads,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)


from tpu_ac.ops.linear import bn_inference_nchw as _bn  # noqa: E402


def _se_gate(params: Params, pre: str, h):
    """Squeeze-excite gate (se.conv_reduce -> silu -> se.conv_expand ->
    sigmoid) on globally pooled features."""
    se = jnp.mean(h, axis=(2, 3), keepdims=True)
    se = jax.nn.silu(_conv(se, params[pre + "se.conv_reduce.weight"])
                     + params[pre + "se.conv_reduce.bias"][
                         None, :, None, None])
    return jax.nn.sigmoid(_conv(se, params[pre + "se.conv_expand.weight"])
                          + params[pre + "se.conv_expand.bias"][
                              None, :, None, None])


def efficientnet_forward(params: Params, images: jnp.ndarray,
                         cfg: EfficientNetConfig,
                         *, taps: Sequence[str] = ("stage4", "stage6")
                         ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning tapped stage outputs [B, C, H, W]."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    same = cfg.tf_same
    x = jax.nn.silu(_bn(params, "bn1",
                        _conv(images, params["conv_stem.weight"], stride=2,
                              padding=1, tf_same=same), cfg.bn_eps))
    out: dict[str, jnp.ndarray] = {}
    for si, (expand, _out_c, repeats, stride, k) in enumerate(cfg.stages):
        if si + 1 > deepest:
            break
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            s = stride if bi == 0 else 1
            identity = x
            h = x
            if expand == 1:
                # DepthwiseSeparableConv: dw/bn1 -> se -> pw/bn2
                mid = h.shape[1]
                h = jax.nn.silu(_bn(params, pre + "bn1",
                                    _conv(h, params[pre + "conv_dw.weight"],
                                          stride=s, padding=k // 2,
                                          groups=mid, tf_same=same),
                                    cfg.bn_eps))
                h = h * _se_gate(params, pre, h)
                h = _bn(params, pre + "bn2",
                        _conv(h, params[pre + "conv_pw.weight"]),
                        cfg.bn_eps)
            else:
                h = jax.nn.silu(_bn(params, pre + "bn1",
                                    _conv(h, params[pre + "conv_pw.weight"]),
                                    cfg.bn_eps))
                mid = h.shape[1]
                h = jax.nn.silu(_bn(params, pre + "bn2",
                                    _conv(h, params[pre + "conv_dw.weight"],
                                          stride=s, padding=k // 2,
                                          groups=mid, tf_same=same),
                                    cfg.bn_eps))
                h = h * _se_gate(params, pre, h)
                h = _bn(params, pre + "bn3",
                        _conv(h, params[pre + "conv_pwl.weight"]),
                        cfg.bn_eps)
            if s == 1 and identity.shape[1] == h.shape[1]:
                h = h + identity
            x = h
        name = f"stage{si + 1}"
        if name in taps:
            out[name] = x
    return out


# --------------------------------------------------------------------------
# MnasNet (timm layout) — backbones.py:29-31 registry entries.
# Same MBConv machinery with per-stage SE on/off and a depthwise-separable
# first stage (conv_dw + conv_pw, no expansion).
# --------------------------------------------------------------------------

# stage spec: (kind, expand, channels, repeats, stride, kernel, se)
_MNASNET_B1_STAGES = (
    ("ds", 1, 16, 1, 1, 3, False),
    ("ir", 3, 24, 3, 2, 3, False),
    ("ir", 3, 40, 3, 2, 5, False),
    ("ir", 6, 80, 3, 2, 5, False),
    ("ir", 6, 96, 2, 1, 3, False),
    ("ir", 6, 192, 4, 2, 5, False),
    ("ir", 6, 320, 1, 1, 3, False),
)
_MNASNET_A1_STAGES = (
    ("ds", 1, 16, 1, 1, 3, False),
    ("ir", 6, 24, 2, 2, 3, False),
    ("ir", 3, 40, 3, 2, 5, True),
    ("ir", 6, 80, 4, 2, 3, False),
    ("ir", 6, 112, 2, 1, 3, True),
    ("ir", 6, 160, 3, 2, 5, True),
    ("ir", 6, 320, 1, 1, 3, False),
)


@dataclasses.dataclass(frozen=True)
class MnasNetConfig:
    stages: tuple = _MNASNET_B1_STAGES
    stem_channels: int = 32
    bn_eps: float = 1e-5
    se_ratio: float = 0.25  # vs expanded channels? mnasnet uses in_c basis


MNASNET_B1 = MnasNetConfig()
MNASNET_A1 = MnasNetConfig(stages=_MNASNET_A1_STAGES)


def init_mnasnet_params(seed: int, cfg: MnasNetConfig
                        ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k, groups=1):
        fan = (in_c // groups) * k * k
        p[name + ".weight"] = (
            rng.standard_normal((out_c, in_c // groups, k, k))
            * math.sqrt(2.0 / fan)).astype(np.float32)

    def conv_b(name, out_c, in_c, k):
        conv(name, out_c, in_c, k)
        p[name + ".bias"] = np.zeros((out_c,), np.float32)

    def bn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        p[name + ".running_mean"] = np.zeros((c,), np.float32)
        p[name + ".running_var"] = np.ones((c,), np.float32)

    conv("conv_stem", cfg.stem_channels, 3, 3)
    bn("bn1", cfg.stem_channels)
    in_c = cfg.stem_channels
    for si, (kind, expand, out_c, repeats, _s, k, se) in enumerate(cfg.stages):
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            if kind == "ds":
                conv(pre + "conv_dw", in_c, in_c, k, groups=in_c)
                bn(pre + "bn1", in_c)
                conv(pre + "conv_pw", out_c, in_c, 1)
                bn(pre + "bn2", out_c)
            else:
                mid = in_c * expand
                conv(pre + "conv_pw", mid, in_c, 1)
                bn(pre + "bn1", mid)
                conv(pre + "conv_dw", mid, mid, k, groups=mid)
                bn(pre + "bn2", mid)
                if se:
                    se_c = max(1, int(in_c * cfg.se_ratio))
                    conv_b(pre + "se.conv_reduce", se_c, mid, 1)
                    conv_b(pre + "se.conv_expand", mid, se_c, 1)
                conv(pre + "conv_pwl", out_c, mid, 1)
                bn(pre + "bn3", out_c)
            in_c = out_c
    return {k2: jnp.asarray(v) for k2, v in p.items()}


def mnasnet_forward(params: Params, images: jnp.ndarray, cfg: MnasNetConfig,
                    *, taps: Sequence[str] = ("stage4", "stage6")
                    ) -> dict[str, jnp.ndarray]:
    """Run the trunk (ReLU activations per the MnasNet paper/timm),
    returning tapped stage outputs."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    x = jax.nn.relu(_bn(params, "bn1",
                        _conv(images, params["conv_stem.weight"], stride=2,
                              padding=1), cfg.bn_eps))
    out: dict[str, jnp.ndarray] = {}
    for si, (kind, _e, _oc, repeats, stride, k, se) in enumerate(cfg.stages):
        if si + 1 > deepest:
            break
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            s = stride if bi == 0 else 1
            identity = x
            if kind == "ds":
                h = jax.nn.relu(_bn(params, pre + "bn1",
                                    _conv(x, params[pre + "conv_dw.weight"],
                                          stride=s, padding=k // 2,
                                          groups=x.shape[1]), cfg.bn_eps))
                h = _bn(params, pre + "bn2",
                        _conv(h, params[pre + "conv_pw.weight"]), cfg.bn_eps)
            else:
                h = jax.nn.relu(_bn(params, pre + "bn1",
                                    _conv(x, params[pre + "conv_pw.weight"]),
                                    cfg.bn_eps))
                mid = h.shape[1]
                h = jax.nn.relu(_bn(params, pre + "bn2",
                                    _conv(h, params[pre + "conv_dw.weight"],
                                          stride=s, padding=k // 2,
                                          groups=mid), cfg.bn_eps))
                if se:
                    sq = jnp.mean(h, axis=(2, 3), keepdims=True)
                    sq = jax.nn.relu(
                        _conv(sq, params[pre + "se.conv_reduce.weight"])
                        + params[pre + "se.conv_reduce.bias"][
                            None, :, None, None])
                    sq = jax.nn.sigmoid(
                        _conv(sq, params[pre + "se.conv_expand.weight"])
                        + params[pre + "se.conv_expand.bias"][
                            None, :, None, None])
                    h = h * sq
                h = _bn(params, pre + "bn3",
                        _conv(h, params[pre + "conv_pwl.weight"]), cfg.bn_eps)
            if s == 1 and identity.shape[1] == h.shape[1]:
                h = h + identity
            x = h
        name = f"stage{si + 1}"
        if name in taps:
            out[name] = x
    return out


# --------------------------------------------------------------------------
# EfficientNetV2 (timm tf_efficientnetv2_m / _l) — backbones.py:47-48.
# Early stages are ConvBnAct ("cn") and fused-MBConv ("er", EdgeResidual:
# 3x3 expand conv + 1x1 project, no depthwise/SE); later stages are the
# B-series MBConv ("ir") with SE.  SiLU activations throughout.
# --------------------------------------------------------------------------

# stage spec: (kind, expand, channels, repeats, stride, kernel, se)
_EFFNETV2_M_STAGES = (
    ("cn", 1, 24, 3, 1, 3, False),
    ("er", 4, 48, 5, 2, 3, False),
    ("er", 4, 80, 5, 2, 3, False),
    ("ir", 4, 160, 7, 2, 3, True),
    ("ir", 6, 176, 14, 1, 3, True),
    ("ir", 6, 304, 18, 2, 3, True),
    ("ir", 6, 512, 5, 1, 3, True),
)
_EFFNETV2_L_STAGES = (
    ("cn", 1, 32, 4, 1, 3, False),
    ("er", 4, 64, 7, 2, 3, False),
    ("er", 4, 96, 7, 2, 3, False),
    ("ir", 4, 192, 10, 2, 3, True),
    ("ir", 6, 224, 19, 1, 3, True),
    ("ir", 6, 384, 25, 2, 3, True),
    ("ir", 6, 640, 7, 1, 3, True),
)


@dataclasses.dataclass(frozen=True)
class EfficientNetV2Config:
    stages: tuple = _EFFNETV2_M_STAGES
    stem_channels: int = 24
    bn_eps: float = 1e-3  # tf variants
    se_ratio: float = 0.25  # of block input channels
    tf_same: bool = True  # tf_ ports: TF SAME padding on strided convs


EFFICIENTNETV2_M = EfficientNetV2Config()
EFFICIENTNETV2_L = EfficientNetV2Config(stages=_EFFNETV2_L_STAGES,
                                        stem_channels=32)


def init_efficientnetv2_params(seed: int, cfg: EfficientNetV2Config
                               ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k, groups=1):
        fan = (in_c // groups) * k * k
        p[name + ".weight"] = (
            rng.standard_normal((out_c, in_c // groups, k, k))
            * math.sqrt(2.0 / fan)).astype(np.float32)

    def conv_b(name, out_c, in_c, k):
        conv(name, out_c, in_c, k)
        p[name + ".bias"] = np.zeros((out_c,), np.float32)

    def bn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        p[name + ".running_mean"] = np.zeros((c,), np.float32)
        p[name + ".running_var"] = np.ones((c,), np.float32)

    conv("conv_stem", cfg.stem_channels, 3, 3)
    bn("bn1", cfg.stem_channels)
    in_c = cfg.stem_channels
    for si, (kind, expand, out_c, repeats, _s, k, se) in enumerate(
            cfg.stages):
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            if kind == "cn":
                conv(pre + "conv", out_c, in_c, k)
                bn(pre + "bn1", out_c)
            elif kind == "er":
                mid = in_c * expand
                conv(pre + "conv_exp", mid, in_c, k)
                bn(pre + "bn1", mid)
                conv(pre + "conv_pwl", out_c, mid, 1)
                bn(pre + "bn2", out_c)
            else:
                mid = in_c * expand
                conv(pre + "conv_pw", mid, in_c, 1)
                bn(pre + "bn1", mid)
                conv(pre + "conv_dw", mid, mid, k, groups=mid)
                bn(pre + "bn2", mid)
                if se:
                    se_c = max(1, int(in_c * cfg.se_ratio))
                    conv_b(pre + "se.conv_reduce", se_c, mid, 1)
                    conv_b(pre + "se.conv_expand", mid, se_c, 1)
                conv(pre + "conv_pwl", out_c, mid, 1)
                bn(pre + "bn3", out_c)
            in_c = out_c
    return {k2: jnp.asarray(v) for k2, v in p.items()}


def efficientnetv2_forward(params: Params, images: jnp.ndarray,
                           cfg: EfficientNetV2Config,
                           *, taps: Sequence[str] = ("stage4", "stage6")
                           ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning tapped stage outputs [B, C, H, W]."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    same = cfg.tf_same
    x = jax.nn.silu(_bn(params, "bn1",
                        _conv(images, params["conv_stem.weight"], stride=2,
                              padding=1, tf_same=same), cfg.bn_eps))
    out: dict[str, jnp.ndarray] = {}
    for si, (kind, _e, _oc, repeats, stride, k, se) in enumerate(cfg.stages):
        if si + 1 > deepest:
            break
        for bi in range(repeats):
            pre = f"blocks.{si}.{bi}."
            s = stride if bi == 0 else 1
            identity = x
            if kind == "cn":
                h = jax.nn.silu(_bn(params, pre + "bn1",
                                    _conv(x, params[pre + "conv.weight"],
                                          stride=s, padding=k // 2,
                                          tf_same=same),
                                    cfg.bn_eps))
            elif kind == "er":
                h = jax.nn.silu(_bn(params, pre + "bn1",
                                    _conv(x, params[pre + "conv_exp.weight"],
                                          stride=s, padding=k // 2,
                                          tf_same=same),
                                    cfg.bn_eps))
                h = _bn(params, pre + "bn2",
                        _conv(h, params[pre + "conv_pwl.weight"]),
                        cfg.bn_eps)
            else:
                h = jax.nn.silu(_bn(params, pre + "bn1",
                                    _conv(x, params[pre + "conv_pw.weight"]),
                                    cfg.bn_eps))
                mid = h.shape[1]
                h = jax.nn.silu(_bn(params, pre + "bn2",
                                    _conv(h, params[pre + "conv_dw.weight"],
                                          stride=s, padding=k // 2,
                                          groups=mid, tf_same=same),
                                    cfg.bn_eps))
                if se:
                    sq = jnp.mean(h, axis=(2, 3), keepdims=True)
                    sq = jax.nn.silu(
                        _conv(sq, params[pre + "se.conv_reduce.weight"])
                        + params[pre + "se.conv_reduce.bias"][
                            None, :, None, None])
                    sq = jax.nn.sigmoid(
                        _conv(sq, params[pre + "se.conv_expand.weight"])
                        + params[pre + "se.conv_expand.bias"][
                            None, :, None, None])
                    h = h * sq
                h = _bn(params, pre + "bn3",
                        _conv(h, params[pre + "conv_pwl.weight"]),
                        cfg.bn_eps)
            if s == 1 and identity.shape[1] == h.shape[1]:
                h = h + identity
            x = h
        name = f"stage{si + 1}"
        if name in taps:
            out[name] = x
    return out
