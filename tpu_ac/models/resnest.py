"""ResNeSt (split-attention ResNet), functional and TPU-first.

Registry entry ``resnest50`` (reference backbones.py:14,
``timm.create_model("resnest50d_4s2x40d")``): radix 4, cardinality 2,
base width 40, deep 3-conv stem ("d"), average-pool downsampling, and
AvgPool-BEFORE-conv2 (avd_first — the "fast" ablation this variant uses)
in strided blocks.

Split attention = grouped 3x3 conv producing radix*width channels, a
global-pooled two-layer gate (fc1/bn1/fc2, grouped by cardinality), and a
radix-softmax that mixes the radix splits — all dense matmul/conv work
that rides the MXU; the gate is a [B, C] bottleneck.

Param keys follow the timm/ResNeSt layout (``conv1.{0,1,3,4,6}``,
``layerL.B.conv2.{conv,bn0,fc1,bn1,fc2}``, ``downsample.{1,2}``), so
released checkpoints convert as array copies.  No timm exists in this
environment; validated by shape/gate invariants (PARITY.md).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class ResNeStConfig:
    block_counts: tuple[int, ...] = (3, 4, 6, 3)
    radix: int = 4
    cardinality: int = 2
    base_width: int = 40
    stem_width: int = 32
    expansion: int = 4
    bn_eps: float = 1e-5
    # resnest50d_4s2x40d is the "fast" ablation: AvgPool BEFORE the
    # split-attention conv in strided blocks (timm block_args avd_first)
    avd_first: bool = True

    def group_width(self, planes: int) -> int:
        return int(planes * (self.base_width / 64.0)) * self.cardinality

    @property
    def stage_planes(self) -> tuple[int, ...]:
        return (64, 128, 256, 512)

    @property
    def stage_out_channels(self) -> tuple[int, ...]:
        return tuple(p * self.expansion for p in self.stage_planes)


RESNEST50D_4S2X40D = ResNeStConfig()


def init_resnest_params(seed: int, cfg: ResNeStConfig
                        ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k, groups=1):
        fan = in_c // groups * k * k
        p[name + ".weight"] = (
            rng.standard_normal((out_c, in_c // groups, k, k))
            * np.sqrt(2.0 / fan)).astype(np.float32)

    def bn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        p[name + ".running_mean"] = np.zeros((c,), np.float32)
        p[name + ".running_var"] = np.ones((c,), np.float32)

    sw = cfg.stem_width
    conv("conv1.0", sw, 3, 3)
    bn("conv1.1", sw)
    conv("conv1.3", sw, sw, 3)
    bn("conv1.4", sw)
    conv("conv1.6", sw * 2, sw, 3)
    bn("bn1", sw * 2)

    in_c = sw * 2
    for li, (n_blocks, planes) in enumerate(zip(cfg.block_counts,
                                                cfg.stage_planes)):
        gw = cfg.group_width(planes)
        out_c = planes * cfg.expansion
        inter = max(gw * cfg.radix // 4, 32)
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            conv(pre + "conv1", gw, in_c, 1)
            bn(pre + "bn1", gw)
            conv(pre + "conv2.conv", gw * cfg.radix, gw, 3,
                 groups=cfg.cardinality * cfg.radix)
            bn(pre + "conv2.bn0", gw * cfg.radix)
            conv(pre + "conv2.fc1", inter, gw, 1, groups=cfg.cardinality)
            p[pre + "conv2.fc1.bias"] = np.zeros((inter,), np.float32)
            bn(pre + "conv2.bn1", inter)
            conv(pre + "conv2.fc2", gw * cfg.radix, inter, 1,
                 groups=cfg.cardinality)
            p[pre + "conv2.fc2.bias"] = np.zeros((gw * cfg.radix,),
                                                 np.float32)
            conv(pre + "conv3", out_c, gw, 1)
            bn(pre + "bn3", out_c)
            if b == 0:
                conv(pre + "downsample.1", out_c, in_c, 1)
                bn(pre + "downsample.2", out_c)
            in_c = out_c
    return {k: jnp.asarray(v) for k, v in p.items()}


def _conv(x, w, stride=1, padding=0, groups=1, precision=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups, precision=precision)


def _bn(params: Params, name: str, x: jnp.ndarray, eps: float
        ) -> jnp.ndarray:
    shape = [1, -1] + [1] * (x.ndim - 2)
    w = params[name + ".weight"].reshape(shape)
    b = params[name + ".bias"].reshape(shape)
    mean = params[name + ".running_mean"].reshape(shape)
    var = params[name + ".running_var"].reshape(shape)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def _avgpool(x, k, stride, padding, count_include_pad=True):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    if count_include_pad:
        return summed / (k * k)
    ones = jnp.ones_like(x[:, :1])
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    return summed / counts


def _rsoftmax(x: jnp.ndarray, radix: int, cardinality: int) -> jnp.ndarray:
    """[B, radix*C] gate logits -> radix-softmax (grouped by cardinality).

    Matches the official rSoftMax exactly: view (B, card, radix, c'),
    transpose to radix-major, softmax over radix, and flatten WITHOUT
    transposing back — the flattened gates are radix-major so that
    chunk r of the output aligns with radix-split r of the conv features.
    radix == 1 uses a sigmoid gate like the official module (no registry
    config hits it — resnest50d_4s2x40d is radix 4 — but the unit keeps
    the upstream semantics).
    """
    if radix == 1:
        return jax.nn.sigmoid(x)
    b = x.shape[0]
    x = x.reshape(b, cardinality, radix, -1).transpose(0, 2, 1, 3)
    x = jax.nn.softmax(x, axis=1)
    return x.reshape(b, -1)


def _split_attn_conv(params: Params, pre: str, x: jnp.ndarray,
                     cfg: ResNeStConfig, stride: int,
                     precision) -> jnp.ndarray:
    """SplAtConv2d: grouped conv -> radix-softmax-gated mix of splits."""
    r, card = cfg.radix, cfg.cardinality
    y = _conv(x, params[pre + "conv.weight"], stride=stride, padding=1,
              groups=card * r, precision=precision)
    y = jax.nn.relu(_bn(params, pre + "bn0", y, cfg.bn_eps))
    b, rc, h, w = y.shape
    c = rc // r
    splits = y.reshape(b, r, c, h, w)
    gap = jnp.mean(jnp.sum(splits, axis=1), axis=(2, 3))       # [B, C]
    gate = _conv(gap[:, :, None, None], params[pre + "fc1.weight"],
                 groups=card, precision=precision)
    gate = gate + params[pre + "fc1.bias"][None, :, None, None]
    gate = jax.nn.relu(_bn(params, pre + "bn1", gate, cfg.bn_eps))
    gate = _conv(gate, params[pre + "fc2.weight"], groups=card,
                 precision=precision)
    gate = gate + params[pre + "fc2.bias"][None, :, None, None]
    atten = _rsoftmax(gate[:, :, 0, 0], r, card)               # [B, r*C]
    atten = atten.reshape(b, r, c, 1, 1)
    return jnp.sum(atten * splits, axis=1)                     # [B, C, H, W]


def resnest_forward(params: Params, images: jnp.ndarray, cfg: ResNeStConfig,
                    *, taps: Sequence[str] = ("layer2", "layer3"),
                    precision=jax.lax.Precision.HIGHEST
                    ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning tapped stage outputs [B, C, H, W]; stops
    after the deepest tap (hook-abort semantics, common.py:262-268)."""
    eps = cfg.bn_eps
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps) if taps else 4

    x = _conv(images, params["conv1.0.weight"], stride=2, padding=1,
              precision=precision)
    x = jax.nn.relu(_bn(params, "conv1.1", x, eps))
    x = _conv(x, params["conv1.3.weight"], padding=1, precision=precision)
    x = jax.nn.relu(_bn(params, "conv1.4", x, eps))
    x = _conv(x, params["conv1.6.weight"], padding=1, precision=precision)
    x = jax.nn.relu(_bn(params, "bn1", x, eps))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))

    out: dict[str, jnp.ndarray] = {}
    for li, n_blocks in enumerate(cfg.block_counts):
        if li + 1 > deepest:
            break
        stride = 1 if li == 0 else 2
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            s = stride if b == 0 else 1
            identity = x
            y = _conv(x, params[pre + "conv1.weight"], precision=precision)
            y = jax.nn.relu(_bn(params, pre + "bn1", y, eps))
            # avd: conv2 runs at stride 1; a 3x3/s average pool does the
            # downsampling.  resnest50d_4s2x40d is a "fast" variant built
            # with avd_first=True (pool BEFORE the split-attention conv).
            if s > 1 and cfg.avd_first:
                y = _avgpool(y, 3, s, 1)
            y = _split_attn_conv(params, pre + "conv2.", y, cfg, 1,
                                 precision)
            if s > 1 and not cfg.avd_first:
                y = _avgpool(y, 3, s, 1)
            y = _conv(y, params[pre + "conv3.weight"], precision=precision)
            y = _bn(params, pre + "bn3", y, eps)
            if pre + "downsample.1.weight" in params:
                # avg_down: AvgPool(s) -> 1x1 conv (stride 1) -> BN
                identity = _avgpool(x, s, s, 0) if s > 1 else x
                identity = _conv(identity,
                                 params[pre + "downsample.1.weight"],
                                 precision=precision)
                identity = _bn(params, pre + "downsample.2", identity, eps)
            x = jax.nn.relu(y + identity)
        name = f"layer{li + 1}"
        if name in taps:
            out[name] = x
    return out
