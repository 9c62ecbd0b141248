"""Trainable-BatchNorm ResNets for the SCAN stages, functional.

Rebuild of Unsupervised-Classification-master/models/resnet_cifar.py (and
resnet_stl.py): 3x3 stem (stride 1, no maxpool for CIFAR; STL keeps the
maxpool), four BasicBlock stages [2,2,2,2] at widths 64/128/256/512.

``bottleneck=True`` + ``imagenet_stem=True`` gives the torchvision-layout
ResNet-50 the reference uses for the ImageNet SCAN configs
(models/resnet.py:1-12: torchvision.models.resnet50 with fc stripped):
7x7/s2 stem + maxpool, Bottleneck blocks [3,4,6,3] with stride on the 3x3
conv (ResNet v1.5) and ``downsample.{0,1}`` projection names, so a remapped
MoCo-v2 checkpoint (models/convert.moco_to_contrastive_params) loads as a
plain key-for-key array copy.

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
    bottleneck: bool = False    # Bottleneck blocks + torchvision names
    imagenet_stem: bool = False  # 7x7/s2 conv + maxpool stem
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1

    @property
    def feature_dim(self) -> int:
        return self.widths[-1] * self.expansion

    @property
    def shortcut_name(self) -> str:
        # SCAN's cifar resnet calls the projection "shortcut"
        # (resnet_cifar.py:28-33); torchvision calls it "downsample".
        return "downsample" if self.bottleneck else "shortcut"


RESNET18_CIFAR = CifarResNetConfig()
RESNET18_STL = CifarResNetConfig(stem_maxpool=True)
RESNET50_IMAGENET = CifarResNetConfig(
    block_counts=(3, 4, 6, 3), bottleneck=True, imagenet_stem=True,
    stem_maxpool=True)


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

    conv("conv1", cfg.widths[0], 3, 7 if cfg.imagenet_stem else 3)
    bn("bn1", cfg.widths[0])
    sc = cfg.shortcut_name
    in_c = cfg.widths[0]
    for li, (n_blocks, width) in enumerate(zip(cfg.block_counts, cfg.widths)):
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            out_c = width * cfg.expansion
            if cfg.bottleneck:
                conv(pre + "conv1", width, in_c, 1)
                bn(pre + "bn1", width)
                conv(pre + "conv2", width, width, 3)
                bn(pre + "bn2", width)
                conv(pre + "conv3", out_c, width, 1)
                bn(pre + "bn3", out_c)
            else:
                conv(pre + "conv1", width, in_c, 3)
                bn(pre + "bn1", width)
                conv(pre + "conv2", width, width, 3)
                bn(pre + "bn2", width)
            if in_c != out_c or (li > 0 and b == 0):
                conv(pre + sc + ".0", out_c, in_c, 1)
                bn(pre + sc + ".1", out_c)
            in_c = out_c
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
    if cfg.imagenet_stem:
        stem = _conv(images, params["conv1.weight"], stride=2, padding=3)
    else:
        stem = _conv(images, params["conv1.weight"])
    x = jax.nn.relu(_bn(params, state, new_state, "bn1", stem, train, cfg))
    if cfg.stem_maxpool:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            ((0, 0), (0, 0), (1, 1), (1, 1)))
    sc = cfg.shortcut_name
    for li, n_blocks in enumerate(cfg.block_counts):
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            stride = 2 if (li > 0 and b == 0) else 1
            identity = x
            if cfg.bottleneck:
                # torchvision Bottleneck (ResNet v1.5): 1x1 -> 3x3(stride)
                # -> 1x1 expand
                out = jax.nn.relu(_bn(params, state, new_state, pre + "bn1",
                                      _conv(x, params[pre + "conv1.weight"],
                                            padding=0), train, cfg))
                out = jax.nn.relu(_bn(params, state, new_state, pre + "bn2",
                                      _conv(out, params[pre + "conv2.weight"],
                                            stride=stride), train, cfg))
                out = _bn(params, state, new_state, pre + "bn3",
                          _conv(out, params[pre + "conv3.weight"],
                                padding=0), train, cfg)
            else:
                out = jax.nn.relu(_bn(params, state, new_state, pre + "bn1",
                                      _conv(x, params[pre + "conv1.weight"],
                                            stride=stride), train, cfg))
                out = _bn(params, state, new_state, pre + "bn2",
                          _conv(out, params[pre + "conv2.weight"]), train,
                          cfg)
            if pre + sc + ".0.weight" in params:
                identity = _bn(params, state, new_state, pre + sc + ".1",
                               _conv(x, params[pre + sc + ".0.weight"],
                                     stride=stride, padding=0), train, cfg)
            x = jax.nn.relu(out + identity)
    feats = jnp.mean(x, axis=(2, 3))
    return feats, new_state
