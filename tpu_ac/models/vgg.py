"""VGG family (inference mode), torchvision-checkpoint-compatible.

The reference registry lists vgg11/vgg19/vgg19_bn (backbones.py:24-26).
Parameters keep torchvision ``features.<idx>.<param>`` names (indices match
the Sequential layout incl. ReLU/MaxPool slots) so released checkpoints
convert by array copy.  Feature taps are the five stages ``stage1`` ...
``stage5`` (output of each conv block, before its max-pool) — the natural
multi-scale taps for PatchCore-style embedding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Mapping[str, jnp.ndarray]

# torchvision cfgs: numbers are conv output channels, "M" is max-pool
_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    arch: str = "vgg19"
    batch_norm: bool = False
    bn_eps: float = 1e-5

    @property
    def layout(self):
        return _CFGS[self.arch]


VGG11 = VGGConfig("vgg11")
VGG19 = VGGConfig("vgg19")
VGG19_BN = VGGConfig("vgg19", batch_norm=True)


def _sequential_indices(cfg: VGGConfig):
    """Yield (features_index, kind, channels) matching torchvision's
    Sequential numbering (conv[, bn], relu per conv; one slot per pool)."""
    idx = 0
    for v in cfg.layout:
        if v == "M":
            yield idx, "pool", None
            idx += 1
        else:
            yield idx, "conv", v
            idx += 1
            if cfg.batch_norm:
                yield idx, "bn", v
                idx += 1
            yield idx, "relu", None
            idx += 1


def init_vgg_params(seed: int, cfg: VGGConfig) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}
    in_c = 3
    for idx, kind, c in _sequential_indices(cfg):
        if kind == "conv":
            fan = in_c * 9
            p[f"features.{idx}.weight"] = (
                rng.standard_normal((c, in_c, 3, 3)) * math.sqrt(2.0 / fan)
            ).astype(np.float32)
            p[f"features.{idx}.bias"] = np.zeros((c,), np.float32)
            in_c = c
        elif kind == "bn":
            p[f"features.{idx}.weight"] = np.ones((c,), np.float32)
            p[f"features.{idx}.bias"] = np.zeros((c,), np.float32)
            p[f"features.{idx}.running_mean"] = np.zeros((c,), np.float32)
            p[f"features.{idx}.running_var"] = np.ones((c,), np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def vgg_forward(params: Params, images: jnp.ndarray, cfg: VGGConfig,
                *, taps: Sequence[str] = ("stage3", "stage4")
                ) -> dict[str, jnp.ndarray]:
    """Run the feature trunk, tapping stage outputs (pre-pool)."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    x = images
    stage = 1
    out: dict[str, jnp.ndarray] = {}
    for idx, kind, _c in _sequential_indices(cfg):
        if kind == "conv":
            x = jax.lax.conv_general_dilated(
                x, params[f"features.{idx}.weight"], (1, 1),
                ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = x + params[f"features.{idx}.bias"][None, :, None, None]
        elif kind == "bn":
            w = params[f"features.{idx}.weight"][None, :, None, None]
            b = params[f"features.{idx}.bias"][None, :, None, None]
            rm = params[f"features.{idx}.running_mean"][None, :, None, None]
            rv = params[f"features.{idx}.running_var"][None, :, None, None]
            x = (x - rm) * jax.lax.rsqrt(rv + cfg.bn_eps) * w + b
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:  # pool boundary: the completed stage's output is pre-pool x
            name = f"stage{stage}"
            if name in taps:
                out[name] = x
            if stage >= deepest:
                return out
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
            stage += 1
    return out


# --------------------------------------------------------------------------
# AlexNet (torchvision layout) — backbones.py:8 registry entry
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AlexNetConfig:
    pass


ALEXNET = AlexNetConfig()

# (features_idx, out_c, in_c, kernel, stride, padding)
_ALEXNET_CONVS = (
    (0, 64, 3, 11, 4, 2),
    (3, 192, 64, 5, 1, 2),
    (6, 384, 192, 3, 1, 1),
    (8, 256, 384, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
)
# max-pool positions after these feature indices (3x3, stride 2)
_ALEXNET_POOL_AFTER = {0, 3, 10}


def init_alexnet_params(seed: int, cfg: AlexNetConfig = ALEXNET
                        ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}
    for idx, out_c, in_c, k, _s, _pad in _ALEXNET_CONVS:
        fan = in_c * k * k
        p[f"features.{idx}.weight"] = (
            rng.standard_normal((out_c, in_c, k, k)) * math.sqrt(2.0 / fan)
        ).astype(np.float32)
        p[f"features.{idx}.bias"] = np.zeros((out_c,), np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def alexnet_forward(params: Params, images: jnp.ndarray,
                    cfg: AlexNetConfig = ALEXNET,
                    *, taps: Sequence[str] = ("conv4", "conv5")
                    ) -> dict[str, jnp.ndarray]:
    """Tap names conv1..conv5 (post-ReLU, pre-pool)."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    x = images
    out: dict[str, jnp.ndarray] = {}
    for n, (idx, _o, _i, _k, stride, pad) in enumerate(_ALEXNET_CONVS,
                                                       start=1):
        x = jax.lax.conv_general_dilated(
            x, params[f"features.{idx}.weight"], (stride, stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + params[f"features.{idx}.bias"][None, :, None, None])
        if f"conv{n}" in taps:
            out[f"conv{n}"] = x
        if n >= deepest:
            return out
        if idx in _ALEXNET_POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
    return out
