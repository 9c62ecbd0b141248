"""ResNet / WideResNet family, torchvision-checkpoint-compatible, TPU-first.

The reference's PatchCore configs use torchvision ``wideresnet50_2``
layer2+layer3 features (backbones.py:7-50, sample_training.sh:7-34); the
paper-repro clustering config uses the same backbone.  This is an
inference-mode functional ResNet: parameters keep torchvision state_dict
names (``layer2.3.conv1.weight``, ``bn1.running_mean``, ...) so released
checkpoints convert by array copy, and BatchNorm folds running statistics
(frozen backbone — PatchCore never trains it).

TPU notes: convs run as ``lax.conv_general_dilated`` in NCHW/OIHW (torch
layouts, no transposes); BN+ReLU are elementwise tails XLA fuses into the
convs; the forward stops after the deepest tapped stage like the hook
early-abort in the reference (common.py:262-268).
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
class ResNetConfig:
    block_counts: tuple[int, ...] = (3, 4, 6, 3)  # resnet50
    width_per_group: int = 64                     # 128 for wide_resnet50_2
    expansion: int = 4                            # 1 for BasicBlock nets
    block: str = "bottleneck"                     # "bottleneck" | "basic"
    groups: int = 1                               # 32 for ResNeXt
    bn_eps: float = 1e-5
    num_classes: int = 1000

    @property
    def stage_out_channels(self) -> tuple[int, ...]:
        # out channels are expansion * base planes (64,128,256,512) —
        # independent of width_per_group (torchvision wide resnet keeps
        # the same inter-stage channel counts, only inner width doubles).
        return tuple(64 * (2 ** i) * self.expansion for i in range(4))


RESNET50 = ResNetConfig()
WIDE_RESNET50_2 = ResNetConfig(width_per_group=128)
RESNET101 = ResNetConfig(block_counts=(3, 4, 23, 3))
WIDE_RESNET101_2 = ResNetConfig(block_counts=(3, 4, 23, 3),
                                width_per_group=128)
RESNET18 = ResNetConfig(block_counts=(2, 2, 2, 2), expansion=1,
                        block="basic")
RESNET34 = ResNetConfig(block_counts=(3, 4, 6, 3), expansion=1,
                        block="basic")
RESNEXT101_32X8D = ResNetConfig(block_counts=(3, 4, 23, 3), groups=32,
                                width_per_group=8)
RESNET200 = ResNetConfig(block_counts=(3, 24, 36, 3))


def init_resnet_params(seed: int, cfg: ResNetConfig) -> dict[str, jnp.ndarray]:
    """Kaiming-style random init with identity BN running stats."""
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

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for li, (n_blocks, planes_base) in enumerate(
            zip(cfg.block_counts, (64, 128, 256, 512))):
        out_c = planes_base * cfg.expansion
        for b in range(n_blocks):
            pre = f"layer{li + 1}.{b}."
            if cfg.block == "basic":
                conv(pre + "conv1", out_c, in_c, 3)
                bn(pre + "bn1", out_c)
                conv(pre + "conv2", out_c, out_c, 3)
                bn(pre + "bn2", out_c)
                needs_down = b == 0 and (li > 0 or in_c != out_c)
            else:
                # torchvision: width = planes * (base_width/64) * groups
                width = (planes_base * cfg.width_per_group // 64
                         * cfg.groups)
                conv(pre + "conv1", width, in_c, 1)
                bn(pre + "bn1", width)
                conv(pre + "conv2", width, width // cfg.groups, 3)
                bn(pre + "bn2", width)
                conv(pre + "conv3", out_c, width, 1)
                bn(pre + "bn3", out_c)
                needs_down = b == 0
            if needs_down:
                conv(pre + "downsample.0", out_c, in_c, 1)
                bn(pre + "downsample.1", out_c)
            in_c = out_c
    p["fc.weight"] = (rng.standard_normal((cfg.num_classes, in_c)) * 0.01
                      ).astype(np.float32)
    p["fc.bias"] = np.zeros((cfg.num_classes,), np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def _conv(x, w, stride=1, padding=0, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)


from tpu_ac.ops.linear import bn_inference_nchw as _bn  # noqa: E402


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 1, 3, 3),
        window_strides=(1, 1, 2, 2), padding=((0, 0), (0, 0), (1, 1), (1, 1)))


def _bottleneck(params: Params, pre: str, x: jnp.ndarray, stride: int,
                eps: float, groups: int = 1) -> jnp.ndarray:
    identity = x
    out = jax.nn.relu(_bn(params, pre + "bn1",
                          _conv(x, params[pre + "conv1.weight"]), eps))
    out = jax.nn.relu(_bn(params, pre + "bn2",
                          _conv(out, params[pre + "conv2.weight"],
                                stride=stride, padding=1, groups=groups),
                          eps))
    out = _bn(params, pre + "bn3", _conv(out, params[pre + "conv3.weight"]),
              eps)
    if pre + "downsample.0.weight" in params:
        identity = _bn(params, pre + "downsample.1",
                       _conv(x, params[pre + "downsample.0.weight"],
                             stride=stride), eps)
    return jax.nn.relu(out + identity)


def _basic_block(params: Params, pre: str, x: jnp.ndarray, stride: int,
                 eps: float) -> jnp.ndarray:
    identity = x
    out = jax.nn.relu(_bn(params, pre + "bn1",
                          _conv(x, params[pre + "conv1.weight"],
                                stride=stride, padding=1), eps))
    out = _bn(params, pre + "bn2",
              _conv(out, params[pre + "conv2.weight"], padding=1), eps)
    if pre + "downsample.0.weight" in params:
        identity = _bn(params, pre + "downsample.1",
                       _conv(x, params[pre + "downsample.0.weight"],
                             stride=stride), eps)
    return jax.nn.relu(out + identity)


_STAGES = ("layer1", "layer2", "layer3", "layer4")


def resnet_forward(params: Params, images: jnp.ndarray, cfg: ResNetConfig,
                   *, taps: Sequence[str] = ("layer2", "layer3")
                   ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning {stage_name: [B, C, H, W]} for tapped stages.

    Stops after the deepest tapped stage (NetworkFeatureAggregator's
    early-abort, common.py:262-268).
    """
    taps = tuple(taps)
    deepest = max(_STAGES.index(t) for t in taps)
    x = jax.nn.relu(_bn(params, "bn1",
                        _conv(images, params["conv1.weight"], stride=2,
                              padding=3), cfg.bn_eps))
    x = _max_pool_3x3_s2(x)
    out: dict[str, jnp.ndarray] = {}
    for li in range(deepest + 1):
        stage = _STAGES[li]
        stride = 1 if li == 0 else 2
        for b in range(cfg.block_counts[li]):
            s = stride if b == 0 else 1
            if cfg.block == "basic":
                x = _basic_block(params, f"{stage}.{b}.", x, s, cfg.bn_eps)
            else:
                x = _bottleneck(params, f"{stage}.{b}.", x, s, cfg.bn_eps,
                                cfg.groups)
        if stage in taps:
            out[stage] = x
    return out


def resnet_classify(params: Params, images: jnp.ndarray,
                    cfg: ResNetConfig) -> jnp.ndarray:
    """Full forward to logits (global-avg-pool + fc)."""
    x = resnet_forward(params, images, cfg, taps=("layer4",))["layer4"]
    x = jnp.mean(x, axis=(2, 3))
    return x @ params["fc.weight"].T + params["fc.bias"]
