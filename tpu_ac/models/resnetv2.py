"""ResNetV2 / BiT (Big Transfer) family, timm-checkpoint-compatible.

The reference registry resolves seven resnetv2_* names via timm
(backbones.py:16-23): BiT variants (width x2/x3/x4, optionally IN-21k
pretrained) plus plain resnetv2_101.  Architecture: pre-activation
bottlenecks with GroupNorm (32 groups) and weight-standardized convs
(Qiao et al.), stem conv + pool, no BatchNorm anywhere.

Parameters keep timm's state_dict names (``stem.conv.weight``,
``stages.<s>.blocks.<b>.conv1/2/3.weight``, ``norm1/2/3.weight/bias``,
``downsample.conv.weight``, final ``norm.weight/bias``) so released
checkpoints convert by array copy.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.pooling import tf_same_pads

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class ResNetV2Config:
    block_counts: tuple[int, ...] = (3, 4, 23, 3)  # resnetv2_101
    width_factor: int = 1                          # 3 for bitm x3 variants
    gn_groups: int = 32
    gn_eps: float = 1e-5
    # preact=True: pre-activation bottlenecks (norm-relu before each conv,
    # bare-conv downsample, final trunk norm).  preact=False: the
    # POST-activation layout timm builds for the R50+ViT hybrid
    # (conv->norm order, stem.norm, downsample.norm, relu after the
    # residual add, NO final norm).  Same conv/norm key names either way.
    preact: bool = True
    # StdConv2dSame: TF SAME (asymmetric) padding on strided convs/pool —
    # timm's hybrid backbone uses it (stem_type='same')
    tf_same: bool = False
    # norm="gn" (GroupNorm, BiT/hybrid) | "bn" (BatchNormAct with running
    # stats — timm's PLAIN resnetv2_50/101 models)
    norm: str = "gn"
    # weight-standardized convs (BiT/hybrid StdConv2d); plain resnetv2
    # uses ordinary convs
    std_conv: bool = True
    ws_eps: float = 1e-8  # BiT passes 1e-8; StdConv2dSame default is 1e-6
    # stem max-pool flavor: "fixed" = BiT (ConstantPad2d(1, 0.) then an
    # UNpadded pool — zeros, not -inf, reach the borders); "standard" =
    # MaxPool2d(3,2,1); "same" = MaxPool2dSame (TF pads, -inf)
    stem_pool: str = "fixed"
    bn_eps: float = 1e-5


# timm's PLAIN resnetv2_101: BatchNorm norms, ordinary convs, standard
# symmetric stem pool — NOT the BiT GN+weight-standardized recipe
RESNETV2_101 = ResNetV2Config(norm="bn", std_conv=False,
                              stem_pool="standard")
RESNETV2_50X3 = ResNetV2Config(block_counts=(3, 4, 6, 3), width_factor=3)
RESNETV2_101X3 = ResNetV2Config(width_factor=3)
RESNETV2_152X4 = ResNetV2Config(block_counts=(3, 8, 36, 3), width_factor=4)
RESNETV2_152X2 = ResNetV2Config(block_counts=(3, 8, 36, 3), width_factor=2)


def init_resnetv2_params(seed: int, cfg: ResNetV2Config
                         ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k):
        fan = in_c * k * k
        p[name + ".weight"] = (
            rng.standard_normal((out_c, in_c, k, k)) * math.sqrt(2.0 / fan)
        ).astype(np.float32)

    def gn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        if cfg.norm == "bn":  # BatchNormAct carries running stats
            p[name + ".running_mean"] = np.zeros((c,), np.float32)
            p[name + ".running_var"] = np.ones((c,), np.float32)

    wf = cfg.width_factor
    conv("stem.conv", 64 * wf, 3, 7)
    if not cfg.preact:
        gn("stem.norm", 64 * wf)
    in_c = 64 * wf
    for si, n_blocks in enumerate(cfg.block_counts):
        out_c = 256 * (2 ** si) * wf
        mid = 64 * (2 ** si) * wf
        for bi in range(n_blocks):
            pre = f"stages.{si}.blocks.{bi}."
            # preact: norms sized by their preceding stream (norm1 on the
            # block INPUT); post-act: norms follow their conv's output
            gn(pre + "norm1", in_c if cfg.preact else mid)
            conv(pre + "conv1", mid, in_c, 1)
            gn(pre + "norm2", mid)
            conv(pre + "conv2", mid, mid, 3)
            gn(pre + "norm3", mid if cfg.preact else out_c)
            conv(pre + "conv3", out_c, mid, 1)
            if bi == 0:
                conv(pre + "downsample.conv", out_c, in_c, 1)
                if not cfg.preact:
                    gn(pre + "downsample.norm", out_c)
            in_c = out_c
    if cfg.preact:
        gn("norm", in_c)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _std_conv(x, w, stride=1, padding=0, eps=1e-8, tf_same=False,
              standardize=True):
    """(Optionally weight-standardized) conv; ``tf_same`` = StdConv2dSame
    (asymmetric TF SAME padding)."""
    if standardize:
        mean = jnp.mean(w, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(w, axis=(1, 2, 3), keepdims=True)
        w = (w - mean) * jax.lax.rsqrt(var + eps)
    if tf_same:
        k = w.shape[2]
        pads = (tf_same_pads(x.shape[2], k, stride),
                tf_same_pads(x.shape[3], k, stride))
    else:
        pads = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pads,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _gn(params: Params, name: str, x: jnp.ndarray,
        groups: int, eps: float) -> jnp.ndarray:
    """GroupNorm without the activation (post-act norm3/downsample.norm)."""
    b, c, h, w = x.shape
    g = min(groups, c)
    xg = x.reshape(b, g, c // g, h, w)
    mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
    x = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, h, w)
    return x * params[name + ".weight"][None, :, None, None] + \
        params[name + ".bias"][None, :, None, None]


from tpu_ac.ops.linear import bn_inference_nchw as _bn_inf  # noqa: E402


def _gn_relu(params: Params, name: str, x: jnp.ndarray,
             groups: int, eps: float) -> jnp.ndarray:
    return jax.nn.relu(_gn(params, name, x, groups, eps))


def resnetv2_forward(params: Params, images: jnp.ndarray,
                     cfg: ResNetV2Config,
                     *, taps: Sequence[str] = ("stage2", "stage3")
                     ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning tapped stage outputs (pre-activation
    residual stream, matching a hook on timm's stages.<i>)."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    same = cfg.tf_same

    def conv(x, wname, stride=1, padding=0):
        return _std_conv(x, params[wname], stride=stride, padding=padding,
                         eps=cfg.ws_eps, tf_same=same,
                         standardize=cfg.std_conv)

    def norm(name, x, relu=True):
        if cfg.norm == "bn":
            y = _bn_inf(params, name, x, cfg.bn_eps)
        else:
            y = _gn(params, name, x, cfg.gn_groups, cfg.gn_eps)
        return jax.nn.relu(y) if relu else y

    x = conv(images, "stem.conv.weight", stride=2, padding=3)
    if not cfg.preact:
        x = norm("stem.norm", x)
    if cfg.stem_pool == "fixed":
        # BiT 'fixed' stem: ConstantPad2d(1, 0.) then an UNpadded pool —
        # the zero (not -inf) border matters where the un-activated stem
        # output is negative
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        pool_pads = ((0, 0), (0, 0))
    elif cfg.stem_pool == "same":
        pool_pads = (tf_same_pads(x.shape[2], 3, 2),
                     tf_same_pads(x.shape[3], 3, 2))
    else:  # "standard": MaxPool2d(3, 2, padding=1)
        pool_pads = ((1, 1), (1, 1))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), *pool_pads))
    out: dict[str, jnp.ndarray] = {}
    for si, n_blocks in enumerate(cfg.block_counts):
        if si + 1 > deepest:
            break
        stride = 1 if si == 0 else 2
        for bi in range(n_blocks):
            pre = f"stages.{si}.blocks.{bi}."
            s = stride if bi == 0 else 1
            if cfg.preact:
                pre_act = norm(pre + "norm1", x)
                if pre + "downsample.conv.weight" in params:
                    shortcut = conv(pre_act,
                                    pre + "downsample.conv.weight",
                                    stride=s)
                else:
                    shortcut = x
                h = conv(pre_act, pre + "conv1.weight")
                h = norm(pre + "norm2", h)
                h = conv(h, pre + "conv2.weight", stride=s, padding=1)
                h = norm(pre + "norm3", h)
                h = conv(h, pre + "conv3.weight")
                x = h + shortcut
            else:
                # post-activation (timm hybrid backbone): conv->norm order,
                # normed downsample, relu after the residual add
                if pre + "downsample.conv.weight" in params:
                    shortcut = norm(
                        pre + "downsample.norm",
                        conv(x, pre + "downsample.conv.weight", stride=s),
                        relu=False)
                else:
                    shortcut = x
                h = norm(pre + "norm1", conv(x, pre + "conv1.weight"))
                h = norm(pre + "norm2",
                         conv(h, pre + "conv2.weight", stride=s, padding=1))
                h = norm(pre + "norm3", conv(h, pre + "conv3.weight"),
                         relu=False)
                x = jax.nn.relu(h + shortcut)
        name = f"stage{si + 1}"
        if name in taps:
            out[name] = x
    return out
