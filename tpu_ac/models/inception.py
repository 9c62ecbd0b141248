"""Inception-v4 and BN-Inception backbones, functional and TPU-first.

Registry entries ``inception_v4`` (reference backbones.py:34,
``timm.create_model("inception_v4")``) and ``bninception``
(backbones.py:8-9, pretrainedmodels).  Both are inference-mode conv zoos:
params hold conv weights + BatchNorm affine/running stats with the
upstream state-dict key layout, so released checkpoints convert as array
copies.

Inception-v4 follows the Cadene/timm module tree: ``features.{i}`` with
BasicConv2d (conv+bn), Mixed3a/4a/5a stems, 4x InceptionA, ReductionA,
7x InceptionB, ReductionB, 3x InceptionC.  Taps address feature indices
(``features.9``, ``features.17``, ...) — what a reference hook on the
Sequential would capture.

BN-Inception follows pretrainedmodels' FLAT naming
(``inception_3a_double_3x3_1_bn.weight`` ...), table-driven over the
BN-paper channel plan.  Taps address the inception outputs
(``inception_3c``, ``inception_4e``, ...).

Parity caveat: no timm/pretrainedmodels or weights exist in this
environment; layouts are reproduced from the upstream sources' structure
and validated by shape/locality tests (PARITY.md).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Mapping[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# shared conv/bn helpers (inference mode)
# ---------------------------------------------------------------------------

def _conv(x, w, stride=(1, 1), padding=(0, 0), precision=None):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision)


from tpu_ac.ops.linear import bn_inference_nchw  # noqa: E402


def _bn(params: Params, name: str, x: jnp.ndarray,
        eps: float = 1e-3) -> jnp.ndarray:
    return bn_inference_nchw(params, name, x, eps)


def _maxpool(x, k=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding), (padding, padding)))


def _avgpool_3x3_s1_noinc(x):
    """AvgPool2d(3, stride 1, pad 1, count_include_pad=False) — the timm
    Inception-v4 flavor."""
    ones = jnp.ones_like(x[:, :1])
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    return summed / counts


def _avgpool_3x3_s1_incpad(x):
    """AvgPool2d(3, stride 1, pad 1, count_include_pad=True) — the
    pretrainedmodels BN-Inception flavor: padded zeros count, so every
    window divides by 9."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    return summed / 9.0


def _maxpool_ceil(x, k=3, stride=2):
    """MaxPool2d(k, s, padding=0, ceil_mode=True): NO top/left padding;
    the bottom/right edge is extended just enough to fit the ceil-count of
    windows (torch clips those windows to the input).  pretrainedmodels'
    BN-Inception uses this for every stride-2 pool — same output shape as
    a symmetric pad-1 pool on even inputs, but windows start at 0, not -1.
    """

    def extra(n: int) -> int:
        out = -(-(n - k) // stride) + 1
        return max(0, (out - 1) * stride + k - n)

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, stride, stride),
        ((0, 0), (0, 0), (0, extra(x.shape[2])), (0, extra(x.shape[3]))))


# ---------------------------------------------------------------------------
# Inception-v4
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class InceptionV4Config:
    bn_eps: float = 1e-3

    @property
    def feature_channels(self) -> dict[int, int]:
        """Output channels at each features.{i} index."""
        ch = {0: 32, 1: 32, 2: 64, 3: 160, 4: 192, 5: 384}
        for i in range(6, 10):
            ch[i] = 384          # InceptionA
        ch[10] = 1024            # ReductionA
        for i in range(11, 18):
            ch[i] = 1024         # InceptionB
        ch[18] = 1536            # ReductionB
        for i in range(19, 22):
            ch[i] = 1536         # InceptionC
        return ch


INCEPTION_V4 = InceptionV4Config()

# (name_suffix, in, out, kernel, stride, padding) per BasicConv2d, grouped
# by features index.  Mirrors Cadene's inceptionv4.py module tree.
_V4_BASIC = {
    0: [("", 3, 32, (3, 3), 2, 0)],
    1: [("", 32, 32, (3, 3), 1, 0)],
    2: [("", 32, 64, (3, 3), 1, 1)],
}

_V4_MIXED3A = [("conv", 64, 96, (3, 3), 2, 0)]
_V4_MIXED4A = [
    ("branch0.0", 160, 64, (1, 1), 1, 0),
    ("branch0.1", 64, 96, (3, 3), 1, 0),
    ("branch1.0", 160, 64, (1, 1), 1, 0),
    ("branch1.1", 64, 64, (1, 7), 1, (0, 3)),
    ("branch1.2", 64, 64, (7, 1), 1, (3, 0)),
    ("branch1.3", 64, 96, (3, 3), 1, 0),
]
_V4_MIXED5A = [("conv", 192, 192, (3, 3), 2, 0)]

_V4_INCEPTION_A = [
    ("branch0", 384, 96, (1, 1), 1, 0),
    ("branch1.0", 384, 64, (1, 1), 1, 0),
    ("branch1.1", 64, 96, (3, 3), 1, 1),
    ("branch2.0", 384, 64, (1, 1), 1, 0),
    ("branch2.1", 64, 96, (3, 3), 1, 1),
    ("branch2.2", 96, 96, (3, 3), 1, 1),
    ("branch3.1", 384, 96, (1, 1), 1, 0),
]
_V4_REDUCTION_A = [
    ("branch0", 384, 384, (3, 3), 2, 0),
    ("branch1.0", 384, 192, (1, 1), 1, 0),
    ("branch1.1", 192, 224, (3, 3), 1, 1),
    ("branch1.2", 224, 256, (3, 3), 2, 0),
]
_V4_INCEPTION_B = [
    ("branch0", 1024, 384, (1, 1), 1, 0),
    ("branch1.0", 1024, 192, (1, 1), 1, 0),
    ("branch1.1", 192, 224, (1, 7), 1, (0, 3)),
    ("branch1.2", 224, 256, (7, 1), 1, (3, 0)),
    ("branch2.0", 1024, 192, (1, 1), 1, 0),
    ("branch2.1", 192, 192, (7, 1), 1, (3, 0)),
    ("branch2.2", 192, 224, (1, 7), 1, (0, 3)),
    ("branch2.3", 224, 224, (7, 1), 1, (3, 0)),
    ("branch2.4", 224, 256, (1, 7), 1, (0, 3)),
    ("branch3.1", 1024, 128, (1, 1), 1, 0),
]
_V4_REDUCTION_B = [
    ("branch0.0", 1024, 192, (1, 1), 1, 0),
    ("branch0.1", 192, 192, (3, 3), 2, 0),
    ("branch1.0", 1024, 256, (1, 1), 1, 0),
    ("branch1.1", 256, 256, (1, 7), 1, (0, 3)),
    ("branch1.2", 256, 320, (7, 1), 1, (3, 0)),
    ("branch1.3", 320, 320, (3, 3), 2, 0),
]
_V4_INCEPTION_C = [
    ("branch0", 1536, 256, (1, 1), 1, 0),
    ("branch1_0", 1536, 384, (1, 1), 1, 0),
    ("branch1_1a", 384, 256, (1, 3), 1, (0, 1)),
    ("branch1_1b", 384, 256, (3, 1), 1, (1, 0)),
    ("branch2_0", 1536, 384, (1, 1), 1, 0),
    ("branch2_1", 384, 448, (3, 1), 1, (1, 0)),
    ("branch2_2", 448, 512, (1, 3), 1, (0, 1)),
    ("branch2_3a", 512, 256, (1, 3), 1, (0, 1)),
    ("branch2_3b", 512, 256, (3, 1), 1, (1, 0)),
    ("branch3.1", 1536, 256, (1, 1), 1, 0),
]


def _v4_module_specs(idx: int):
    if idx in _V4_BASIC:
        return _V4_BASIC[idx]
    if idx == 3:
        return _V4_MIXED3A
    if idx == 4:
        return _V4_MIXED4A
    if idx == 5:
        return _V4_MIXED5A
    if 6 <= idx <= 9:
        return _V4_INCEPTION_A
    if idx == 10:
        return _V4_REDUCTION_A
    if 11 <= idx <= 17:
        return _V4_INCEPTION_B
    if idx == 18:
        return _V4_REDUCTION_B
    if 19 <= idx <= 21:
        return _V4_INCEPTION_C
    raise KeyError(idx)


def init_inception_v4_params(seed: int, cfg: InceptionV4Config
                             ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def basic(prefix, in_c, out_c, kernel):
        kh, kw = kernel
        fan = in_c * kh * kw
        p[prefix + ".conv.weight"] = (
            rng.standard_normal((out_c, in_c, kh, kw))
            * np.sqrt(2.0 / fan)).astype(np.float32)
        p[prefix + ".bn.weight"] = np.ones((out_c,), np.float32)
        p[prefix + ".bn.bias"] = np.zeros((out_c,), np.float32)
        p[prefix + ".bn.running_mean"] = np.zeros((out_c,), np.float32)
        p[prefix + ".bn.running_var"] = np.ones((out_c,), np.float32)

    for idx in range(22):
        for suffix, in_c, out_c, kernel, _s, _pad in _v4_module_specs(idx):
            prefix = (f"features.{idx}" if not suffix
                      else f"features.{idx}.{suffix}")
            basic(prefix, in_c, out_c, kernel)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _v4_basic(params, prefix, x, kernel, stride, padding, eps, precision):
    x = _conv(x, params[prefix + ".conv.weight"], stride, padding,
              precision)
    return jax.nn.relu(_bn(params, prefix + ".bn", x, eps))


def _v4_run_module(params: Params, idx: int, x: jnp.ndarray,
                   cfg: InceptionV4Config, precision) -> jnp.ndarray:
    eps = cfg.bn_eps

    def b(suffix, y, spec_list=None):
        specs = {s[0]: s for s in (spec_list or _v4_module_specs(idx))}
        _n, _i, _o, kernel, stride, pad = specs[suffix]
        prefix = f"features.{idx}" + (f".{suffix}" if suffix else "")
        return _v4_basic(params, prefix, y, kernel, stride, pad, eps,
                         precision)

    if idx in (0, 1, 2):
        return b("", x)
    if idx == 3:   # Mixed3a: maxpool || conv
        return jnp.concatenate([_maxpool(x), b("conv", x)], axis=1)
    if idx == 4:   # Mixed4a: two conv branches
        b0 = b("branch0.1", b("branch0.0", x))
        b1 = b("branch1.3", b("branch1.2", b("branch1.1",
                                             b("branch1.0", x))))
        return jnp.concatenate([b0, b1], axis=1)
    if idx == 5:   # Mixed5a: conv || maxpool
        return jnp.concatenate([b("conv", x), _maxpool(x)], axis=1)
    if 6 <= idx <= 9:   # InceptionA
        b0 = b("branch0", x)
        b1 = b("branch1.1", b("branch1.0", x))
        b2 = b("branch2.2", b("branch2.1", b("branch2.0", x)))
        b3 = b("branch3.1", _avgpool_3x3_s1_noinc(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=1)
    if idx == 10:  # ReductionA
        b0 = b("branch0", x)
        b1 = b("branch1.2", b("branch1.1", b("branch1.0", x)))
        return jnp.concatenate([b0, b1, _maxpool(x)], axis=1)
    if 11 <= idx <= 17:  # InceptionB
        b0 = b("branch0", x)
        b1 = b("branch1.2", b("branch1.1", b("branch1.0", x)))
        b2 = b("branch2.4", b("branch2.3", b("branch2.2",
                                             b("branch2.1",
                                               b("branch2.0", x)))))
        b3 = b("branch3.1", _avgpool_3x3_s1_noinc(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=1)
    if idx == 18:  # ReductionB
        b0 = b("branch0.1", b("branch0.0", x))
        b1 = b("branch1.3", b("branch1.2", b("branch1.1",
                                             b("branch1.0", x))))
        return jnp.concatenate([b0, b1, _maxpool(x)], axis=1)
    # InceptionC
    b0 = b("branch0", x)
    b1_0 = b("branch1_0", x)
    b1 = jnp.concatenate([b("branch1_1a", b1_0), b("branch1_1b", b1_0)],
                         axis=1)
    b2_2 = b("branch2_2", b("branch2_1", b("branch2_0", x)))
    b2 = jnp.concatenate([b("branch2_3a", b2_2), b("branch2_3b", b2_2)],
                         axis=1)
    b3 = b("branch3.1", _avgpool_3x3_s1_noinc(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=1)


def inception_v4_forward(params: Params, images: jnp.ndarray,
                         cfg: InceptionV4Config,
                         *, taps: Sequence[str] = ("features.9",
                                                   "features.17"),
                         precision=jax.lax.Precision.HIGHEST
                         ) -> dict[str, jnp.ndarray]:
    """Run the features trunk, returning tapped ``features.{i}`` outputs
    as [B, C, H, W]; stops after the deepest tap."""
    taps = tuple(taps)
    tap_idx = {int(t.split(".")[1]) for t in taps}
    deepest = max(tap_idx) if tap_idx else 21
    out: dict[str, jnp.ndarray] = {}
    x = images
    for idx in range(deepest + 1):
        x = _v4_run_module(params, idx, x, cfg, precision)
        if idx in tap_idx:
            out[f"features.{idx}"] = x
    return out


# ---------------------------------------------------------------------------
# BN-Inception (pretrainedmodels layout, flat names)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BNInceptionConfig:
    bn_eps: float = 1e-5


BNINCEPTION = BNInceptionConfig()

# (1x1, 3x3_reduce, 3x3, d3x3_reduce, d3x3_1, d3x3_2, pool_proj,
#  stride, pool_kind) per inception module — the BN-paper channel plan.
# stride-2 modules drop the 1x1 and pool-proj branches and max-pool.
_BNI_MODULES: dict[str, tuple] = {
    "3a": (64, 64, 64, 64, 96, 96, 32, 1, "avg"),
    "3b": (64, 64, 96, 64, 96, 96, 64, 1, "avg"),
    "3c": (0, 128, 160, 64, 96, 96, 0, 2, "max"),
    "4a": (224, 64, 96, 96, 128, 128, 128, 1, "avg"),
    "4b": (192, 96, 128, 96, 128, 128, 128, 1, "avg"),
    "4c": (160, 128, 160, 128, 160, 160, 128, 1, "avg"),
    "4d": (96, 128, 192, 160, 192, 192, 128, 1, "avg"),
    "4e": (0, 128, 192, 192, 256, 256, 0, 2, "max"),
    "5a": (352, 192, 320, 160, 224, 224, 128, 1, "avg"),
    "5b": (352, 192, 320, 192, 224, 224, 128, 1, "max"),
}
_BNI_ORDER = tuple(_BNI_MODULES)


def _bni_in_channels() -> dict[str, int]:
    """Input channels per inception module (the stem ends at 192)."""
    ch: dict[str, int] = {}
    cur = 192
    for name, spec in _BNI_MODULES.items():
        ch[name] = cur
        c1, _, c3, _, _, cd2, cp, stride, _ = spec
        cur = c1 + c3 + cd2 + cp + (cur if stride == 2 else 0)
    return ch


def init_bninception_params(seed: int, cfg: BNInceptionConfig
                            ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv_bn(name, in_c, out_c, k):
        kh, kw = (k, k) if isinstance(k, int) else k
        fan = in_c * kh * kw
        p[name + ".weight"] = (rng.standard_normal((out_c, in_c, kh, kw))
                               * np.sqrt(2.0 / fan)).astype(np.float32)
        p[name + ".bias"] = np.zeros((out_c,), np.float32)
        p[name + "_bn.weight"] = np.ones((out_c,), np.float32)
        p[name + "_bn.bias"] = np.zeros((out_c,), np.float32)
        p[name + "_bn.running_mean"] = np.zeros((out_c,), np.float32)
        p[name + "_bn.running_var"] = np.ones((out_c,), np.float32)

    conv_bn("conv1_7x7_s2", 3, 64, 7)
    conv_bn("conv2_3x3_reduce", 64, 64, 1)
    conv_bn("conv2_3x3", 64, 192, 3)
    in_ch = _bni_in_channels()
    for name, spec in _BNI_MODULES.items():
        c1, cr3, c3, crd, cd1, cd2, cp, stride, _pool = spec
        in_c = in_ch[name]
        pre = f"inception_{name}_"
        if c1:
            conv_bn(pre + "1x1", in_c, c1, 1)
        conv_bn(pre + "3x3_reduce", in_c, cr3, 1)
        conv_bn(pre + "3x3", cr3, c3, 3)
        conv_bn(pre + "double_3x3_reduce", in_c, crd, 1)
        conv_bn(pre + "double_3x3_1", crd, cd1, 3)
        conv_bn(pre + "double_3x3_2", cd1, cd2, 3)
        if cp:
            conv_bn(pre + "pool_proj", in_c, cp, 1)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _bni_conv(params, name, x, stride, padding, eps, precision):
    x = _conv(x, params[name + ".weight"], stride, padding, precision)
    x = x + params[name + ".bias"][None, :, None, None]
    return jax.nn.relu(_bn(params, name + "_bn", x, eps))


def bninception_forward(params: Params, images: jnp.ndarray,
                        cfg: BNInceptionConfig,
                        *, taps: Sequence[str] = ("inception_3c",
                                                  "inception_4e"),
                        precision=jax.lax.Precision.HIGHEST
                        ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning tapped ``inception_{name}`` outputs;
    stops after the deepest tap."""
    eps = cfg.bn_eps
    taps = tuple(taps)
    tap_names = {t.split("_", 1)[1] for t in taps}
    deepest = max(_BNI_ORDER.index(n) for n in tap_names) if tap_names \
        else len(_BNI_ORDER) - 1

    x = _bni_conv(params, "conv1_7x7_s2", images, 2, 3, eps, precision)
    x = _maxpool_ceil(x)  # MaxPool2d(3, 2, ceil_mode=True): no left pad
    x = _bni_conv(params, "conv2_3x3_reduce", x, 1, 0, eps, precision)
    x = _bni_conv(params, "conv2_3x3", x, 1, 1, eps, precision)
    x = _maxpool_ceil(x)

    out: dict[str, jnp.ndarray] = {}
    for name in _BNI_ORDER[:deepest + 1]:
        c1, _cr3, _c3, _crd, _cd1, _cd2, cp, stride, pool_kind = \
            _BNI_MODULES[name]
        pre = f"inception_{name}_"
        branches = []
        if c1:
            branches.append(_bni_conv(params, pre + "1x1", x, 1, 0, eps,
                                      precision))
        y = _bni_conv(params, pre + "3x3_reduce", x, 1, 0, eps, precision)
        branches.append(_bni_conv(params, pre + "3x3", y, stride, 1, eps,
                                  precision))
        y = _bni_conv(params, pre + "double_3x3_reduce", x, 1, 0, eps,
                      precision)
        y = _bni_conv(params, pre + "double_3x3_1", y, 1, 1, eps,
                      precision)
        branches.append(_bni_conv(params, pre + "double_3x3_2", y, stride,
                                  1, eps, precision))
        if stride == 2:
            branches.append(_maxpool_ceil(x))
        else:
            # BN-Inception avg branches count padded zeros (/9 everywhere)
            pooled = (_avgpool_3x3_s1_incpad(x) if pool_kind == "avg"
                      else _maxpool(x, 3, 1, 1))
            branches.append(_bni_conv(params, pre + "pool_proj", pooled, 1,
                                      0, eps, precision))
        x = jnp.concatenate(branches, axis=1)
        if name in tap_names:
            out[f"inception_{name}"] = x
    return out
