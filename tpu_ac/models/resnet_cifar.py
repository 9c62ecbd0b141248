"""CIFAR/STL ResNet-18 (BasicBlock) with trainable BatchNorm, functional.

Rebuild of Unsupervised-Classification-master/models/resnet_cifar.py (and
resnet_stl.py): 3x3 stem (stride 1, no maxpool for CIFAR; STL keeps the
maxpool), four BasicBlock stages [2,2,2,2] at widths 64/128/256/512.

State handling is explicit and functional: ``params`` holds trainable
arrays, ``state`` holds BatchNorm running statistics; the forward returns
updated state in training mode (momentum 0.1, torch semantics: biased batch
variance normalizes, unbiased updates the running var).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class CifarResNetConfig:
    block_counts: tuple[int, ...] = (2, 2, 2, 2)
    widths: tuple[int, ...] = (64, 128, 256, 512)
    stem_maxpool: bool = False  # True for the STL variant
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @property
    def feature_dim(self) -> int:
        return self.widths[-1]


RESNET18_CIFAR = CifarResNetConfig()
RESNET18_STL = CifarResNetConfig(stem_maxpool=True)


def init_cifar_resnet(seed: int, cfg: CifarResNetConfig
                      ) -> tuple[dict[str, jnp.ndarray], dict[str, jnp.ndarray]]:
    """Returns (params, bn_state)."""
    rng = np.random.default_rng(seed)
    params: dict[str, np.ndarray] = {}
    state: dict[str, np.ndarray] = {}

    def conv(name, out_c, in_c, k):
        fan = in_c * k * k
        params[name + ".weight"] = (
            rng.standard_normal((out_c, in_c, k, k)) * math.sqrt(2.0 / fan)
        ).astype(np.float32)

    def bn(name, c):
        params[name + ".weight"] = np.ones((c,), np.float32)
        params[name + ".bias"] = np.zeros((c,), np.float32)
        state[name + ".running_mean"] = np.zeros((c,), np.float32)
        state[name + ".running_var"] = np.ones((c,), np.float32)

    conv("conv1", cfg.widths[0], 3, 3)
    bn("bn1", cfg.widths[0])
    in_c = cfg.widths[0]
    for li, (n_blocks, width) in enumerate(zip(cfg.block_counts, cfg.widths)):
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            conv(pre + "conv1", width, in_c, 3)
            bn(pre + "bn1", width)
            conv(pre + "conv2", width, width, 3)
            bn(pre + "bn2", width)
            if in_c != width or (li > 0 and b == 0):
                conv(pre + "shortcut.0", width, in_c, 1)
                bn(pre + "shortcut.1", width)
            in_c = width
    return ({k: jnp.asarray(v) for k, v in params.items()},
            {k: jnp.asarray(v) for k, v in state.items()})


def _conv(x, w, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(params: Params, state: Params, new_state: dict, name: str,
        x: jnp.ndarray, train: bool, cfg: CifarResNetConfig) -> jnp.ndarray:
    w = params[name + ".weight"][None, :, None, None]
    b = params[name + ".bias"][None, :, None, None]
    if train:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(1, n - 1)
        m = cfg.bn_momentum
        new_state[name + ".running_mean"] = (
            (1 - m) * state[name + ".running_mean"] + m * mean)
        new_state[name + ".running_var"] = (
            (1 - m) * state[name + ".running_var"] + m * unbiased)
    else:
        mean = state[name + ".running_mean"]
        var = state[name + ".running_var"]
    mean = mean[None, :, None, None]
    var = var[None, :, None, None]
    return (x - mean) * jax.lax.rsqrt(var + cfg.bn_eps) * w + b


def cifar_resnet_forward(params: Params, state: Params, images: jnp.ndarray,
                         cfg: CifarResNetConfig, *, train: bool = False
                         ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """images [B, 3, H, W] -> (features [B, feature_dim], new_bn_state)."""
    new_state = dict(state)
    x = jax.nn.relu(_bn(params, state, new_state, "bn1",
                        _conv(images, params["conv1.weight"]), train, cfg))
    if cfg.stem_maxpool:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            ((0, 0), (0, 0), (1, 1), (1, 1)))
    for li, n_blocks in enumerate(cfg.block_counts):
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            stride = 2 if (li > 0 and b == 0) else 1
            identity = x
            out = jax.nn.relu(_bn(params, state, new_state, pre + "bn1",
                                  _conv(x, params[pre + "conv1.weight"],
                                        stride=stride), train, cfg))
            out = _bn(params, state, new_state, pre + "bn2",
                      _conv(out, params[pre + "conv2.weight"]), train, cfg)
            if pre + "shortcut.0.weight" in params:
                identity = _bn(params, state, new_state, pre + "shortcut.1",
                               _conv(x, params[pre + "shortcut.0.weight"],
                                     stride=stride, padding=0), train, cfg)
            x = jax.nn.relu(out + identity)
    feats = jnp.mean(x, axis=(2, 3))
    return feats, new_state
