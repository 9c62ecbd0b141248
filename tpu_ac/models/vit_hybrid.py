"""Hybrid R50+ViT — the ``vit_r50`` registry entry
(reference backbones.py:39, ``timm.create_model("vit_large_r50_s32_224")``).

A ResNetV2-50 trunk replaces the patch embedding: images -> stride-32
feature grid -> 1x1 conv projection -> tokens, then the standard ViT-Large
transformer (reusing tpu_ac.models.vit block_forward / pos-embed
interpolation).  timm builds this backbone with ``preact=False`` +
``StdConv2dSame`` (POST-activation bottlenecks, stem/downsample norms, TF
SAME padding, no final trunk norm) — reproduced via
ResNetV2Config(preact=False, tf_same=True).

Param keys follow timm's hybrid layout: ``patch_embed.backbone.*`` for the
ResNetV2 (stem.conv/stem.norm, stages.S.blocks.B.* incl. downsample.norm),
``patch_embed.proj.*`` for the projection, plus the usual ViT keys
(cls_token, pos_embed, blocks.*, norm) — checkpoint conversion stays an
array copy.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.models.resnetv2 import (
    ResNetV2Config,
    _gn_relu,
    init_resnetv2_params,
    resnetv2_forward,
)
from tpu_ac.models.vit import (
    ViTConfig,
    block_forward,
    init_vit_params,
    interpolate_pos_encoding,
)
from tpu_ac.ops.normalize import layernorm

Params = Mapping[str, jnp.ndarray]

_BACKBONE_PREFIX = "patch_embed.backbone."


@dataclasses.dataclass(frozen=True)
class HybridViTConfig:
    # timm hybrid backbone: post-act, StdConv2dSame (default eps 1e-6 —
    # BiT's 1e-8 is only passed for the bit models), 'same' stem pool
    resnet: ResNetV2Config = ResNetV2Config(block_counts=(3, 4, 6, 3),
                                            width_factor=1, preact=False,
                                            tf_same=True, stem_pool="same",
                                            ws_eps=1e-6)
    vit: ViTConfig = ViTConfig(embed_dim=1024, depth=24, num_heads=16,
                               img_size=224)
    total_stride: int = 32

    @property
    def grid(self) -> int:
        return self.vit.img_size // self.total_stride


# vit_large_r50_s32_224: full 4-stage ResNetV2-50 (stride 32, 7x7 grid at
# 224) + ViT-L.
VIT_LARGE_R50_S32 = HybridViTConfig()


def init_hybrid_vit_params(seed: int, cfg: HybridViTConfig
                           ) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, jnp.ndarray] = {}
    for k, v in init_resnetv2_params(seed, cfg.resnet).items():
        p[_BACKBONE_PREFIX + k] = v
    d = cfg.vit.embed_dim
    feat_c = 512 * 4 * cfg.resnet.width_factor  # stage4 out channels
    if cfg.resnet.preact:  # post-act trunks have no final norm (Identity)
        p[_BACKBONE_PREFIX + "norm.weight"] = jnp.ones((feat_c,),
                                                       jnp.float32)
        p[_BACKBONE_PREFIX + "norm.bias"] = jnp.zeros((feat_c,),
                                                      jnp.float32)
    # ViT trunk params (pos_embed sized by patch_size=stride: grid+CLS)
    vit_p = init_vit_params(seed + 1, dataclasses.replace(
        cfg.vit, patch_size=cfg.total_stride))
    del vit_p["patch_embed.proj.weight"], vit_p["patch_embed.proj.bias"]
    p.update(vit_p)
    p["patch_embed.proj.weight"] = jnp.asarray(
        (rng.standard_normal((d, feat_c, 1, 1))
         * (feat_c ** -0.5)).astype(np.float32))
    p["patch_embed.proj.bias"] = jnp.zeros((d,), jnp.float32)
    return p


def hybrid_prepare_tokens(params: Params, images: jnp.ndarray,
                          cfg: HybridViTConfig,
                          precision=jax.lax.Precision.HIGHEST
                          ) -> jnp.ndarray:
    bb = {k[len(_BACKBONE_PREFIX):]: v for k, v in params.items()
          if k.startswith(_BACKBONE_PREFIX)}
    n_stages = len(cfg.resnet.block_counts)
    feats = resnetv2_forward(bb, images, cfg.resnet,
                             taps=(f"stage{n_stages}",))[f"stage{n_stages}"]
    if cfg.resnet.preact:  # post-act trunks end at the residual relu
        feats = _gn_relu(bb, "norm", feats, cfg.resnet.gn_groups,
                         cfg.resnet.gn_eps)
    x = jax.lax.conv_general_dilated(
        feats, params["patch_embed.proj.weight"], window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision)
    x = x + params["patch_embed.proj.bias"][None, :, None, None]
    b, d, gh, gw = x.shape
    tokens = x.reshape(b, d, gh * gw).transpose(0, 2, 1)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    vit_cfg = dataclasses.replace(cfg.vit, patch_size=cfg.total_stride)
    return tokens + interpolate_pos_encoding(
        params, tokens.shape[1] - 1, gh * cfg.total_stride,
        gw * cfg.total_stride, vit_cfg)


def hybrid_vit_forward(params: Params, images: jnp.ndarray,
                       cfg: HybridViTConfig, *,
                       taps: Sequence[int] = (),
                       precision=jax.lax.Precision.HIGHEST
                       ) -> dict[int, jnp.ndarray]:
    """Tap-returning trunk, mirroring vit.vit_forward: {i: [B, 1+N, D]}."""
    x = hybrid_prepare_tokens(params, images, cfg, precision)
    taps = tuple(taps)
    depth = (max(taps) + 1) if taps else cfg.vit.depth
    out: dict[int, jnp.ndarray] = {}
    for i in range(depth):
        x = block_forward(params, i, x, cfg.vit, precision)
        if i in taps:
            out[i] = x
    out[-1] = x
    return out


def hybrid_vit_cls_forward(params: Params, images: jnp.ndarray,
                           cfg: HybridViTConfig,
                           precision=jax.lax.Precision.HIGHEST
                           ) -> jnp.ndarray:
    x = hybrid_vit_forward(params, images, cfg, precision=precision)[-1]
    x = layernorm(x, params["norm.weight"], params["norm.bias"],
                  cfg.vit.ln_eps)
    return x[:, 0]
