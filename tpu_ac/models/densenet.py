"""DenseNet family (inference mode), torchvision-checkpoint-compatible.

The reference's strongest PatchCore ensemble includes DenseNet-201
(patchcore-inspection-main/sample_training.sh:24-34: WR101+RNX101+DN201).
Parameters keep torchvision state_dict names
(``features.denseblock1.denselayer1.conv1.weight`` etc.) so released
checkpoints convert by array copy; BatchNorm folds running statistics
(frozen backbone).

Dense connectivity is concatenation-heavy — each layer reads all previous
feature maps.  The forward keeps the growing feature list as one array and
lets XLA fuse the norm/relu/1x1-conv chains; taps are the dense-block
outputs (``denseblock1`` ... ``denseblock4``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DenseNetConfig:
    block_config: tuple[int, ...] = (6, 12, 48, 32)  # densenet201
    growth_rate: int = 32
    num_init_features: int = 64
    bn_size: int = 4
    bn_eps: float = 1e-5
    num_classes: int = 1000


DENSENET201 = DenseNetConfig()
DENSENET169 = DenseNetConfig(block_config=(6, 12, 32, 32))
DENSENET121 = DenseNetConfig(block_config=(6, 12, 24, 16))


def init_densenet_params(seed: int, cfg: DenseNetConfig
                         ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k):
        fan = in_c * k * k
        p[name + ".weight"] = (
            rng.standard_normal((out_c, in_c, k, k)) * math.sqrt(2.0 / fan)
        ).astype(np.float32)

    def bn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        p[name + ".running_mean"] = np.zeros((c,), np.float32)
        p[name + ".running_var"] = np.ones((c,), np.float32)

    conv("features.conv0", cfg.num_init_features, 3, 7)
    bn("features.norm0", cfg.num_init_features)
    c = cfg.num_init_features
    for bi, n_layers in enumerate(cfg.block_config, start=1):
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}."
            bn(pre + "norm1", c + (li - 1) * cfg.growth_rate)
            conv(pre + "conv1", cfg.bn_size * cfg.growth_rate,
                 c + (li - 1) * cfg.growth_rate, 1)
            bn(pre + "norm2", cfg.bn_size * cfg.growth_rate)
            conv(pre + "conv2", cfg.growth_rate,
                 cfg.bn_size * cfg.growth_rate, 3)
        c += n_layers * cfg.growth_rate
        if bi != len(cfg.block_config):
            pre = f"features.transition{bi}."
            bn(pre + "norm", c)
            conv(pre + "conv", c // 2, c, 1)
            c //= 2
    bn("features.norm5", c)
    p["classifier.weight"] = (rng.standard_normal((cfg.num_classes, c))
                              * 0.01).astype(np.float32)
    p["classifier.bias"] = np.zeros((cfg.num_classes,), np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn_relu(params: Params, name: str, x: jnp.ndarray,
             eps: float) -> jnp.ndarray:
    w = params[name + ".weight"][None, :, None, None]
    b = params[name + ".bias"][None, :, None, None]
    rm = params[name + ".running_mean"][None, :, None, None]
    rv = params[name + ".running_var"][None, :, None, None]
    return jax.nn.relu((x - rm) * jax.lax.rsqrt(rv + eps) * w + b)


def densenet_forward(params: Params, images: jnp.ndarray,
                     cfg: DenseNetConfig, *,
                     taps: Sequence[str] = ("denseblock2", "denseblock3")
                     ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning tapped dense-block outputs [B, C, H, W].

    Tap names: denseblock1..denseblock4 (outputs *before* the following
    transition, matching a forward hook on features.denseblockN)."""
    taps = tuple(taps)
    deepest = max(int(t[-1]) for t in taps)
    x = _conv(images, params["features.conv0.weight"], stride=2, padding=3)
    x = _bn_relu(params, "features.norm0", x, cfg.bn_eps)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)))
    out: dict[str, jnp.ndarray] = {}
    for bi, n_layers in enumerate(cfg.block_config, start=1):
        if bi > deepest:
            break
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}."
            h = _bn_relu(params, pre + "norm1", x, cfg.bn_eps)
            h = _conv(h, params[pre + "conv1.weight"])
            h = _bn_relu(params, pre + "norm2", h, cfg.bn_eps)
            h = _conv(h, params[pre + "conv2.weight"], padding=1)
            x = jnp.concatenate([x, h], axis=1)
        name = f"denseblock{bi}"
        if name in taps:
            out[name] = x
        if bi != len(cfg.block_config) and bi < deepest:
            pre = f"features.transition{bi}."
            x = _bn_relu(params, pre + "norm", x, cfg.bn_eps)
            x = _conv(x, params[pre + "conv.weight"])
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                ((0, 0), (0, 0), (0, 0), (0, 0))) / 4.0
    return out
