"""XCiT (cross-covariance image transformer), functional and TPU-first.

The reference exposes ``dino_xcit_{small_12,medium_24}_{p16,p8}`` via
torch.hub (dino-main/hubconf.py:98-151, loading facebookresearch/xcit).
The architecture is rebuilt here:

- ConvPatchEmbed: a ladder of stride-2 conv3x3+BN (+GELU) stages down to
  the patch resolution (4 stages for p16, 3 for p8).
- PositionalEncodingFourier: fixed 2D sinusoidal features projected by a
  learnable 1x1 conv ("pos_embeder" — the official repo's spelling, kept
  so released checkpoints convert as key-for-key array copies).
- XCA blocks: attention over the CHANNEL axis — q/k L2-normalized along
  tokens, [head_dim x head_dim] attention scaled by a learnable per-head
  temperature — plus LPI (two depthwise 3x3 convs with BN) and an MLP,
  each with LayerScale (gamma1/gamma3/gamma2).
- 2 class-attention blocks: the CLS token attends over all tokens.  The
  official block adds the concatenated [mlp(cls), patch] tensor to the
  residual, which doubles the patch tokens — a known quirk of the released
  code, reproduced here because the checkpoints were trained with it.

TPU notes: XCA's [d_h, N] x [N, d_h] contraction is MXU-friendly at any
sequence length (cost linear in N); LPI's depthwise convs lower to XLA
depthwise convolutions; everything is static-shape under jit.

Parity caveat: no xcit source or weights exist in this environment, so the
implementation is checked by shape/invariance tests (channel-softmax rows,
temperature scaling, CLS-only query) rather than a torch oracle; see
PARITY.md.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.normalize import layernorm

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class XCiTConfig:
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    cls_attn_layers: int = 2
    qkv_bias: bool = True
    eta: float = 1.0          # LayerScale init
    tokens_norm: bool = True
    ln_eps: float = 1e-6
    bn_eps: float = 1e-5
    pos_hidden_dim: int = 32
    pos_temperature: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def conv_stage_channels(self) -> tuple[int, ...]:
        d = self.embed_dim
        if self.patch_size == 16:
            return (d // 8, d // 4, d // 2, d)
        if self.patch_size == 8:
            return (d // 4, d // 2, d)
        raise ValueError(f"patch_size {self.patch_size} not in (8, 16)")


XCIT_SMALL_12_P16 = XCiTConfig(patch_size=16, embed_dim=384, depth=12)
XCIT_SMALL_12_P8 = XCiTConfig(patch_size=8, embed_dim=384, depth=12)
XCIT_MEDIUM_24_P16 = XCiTConfig(patch_size=16, embed_dim=512, depth=24)
XCIT_MEDIUM_24_P8 = XCiTConfig(patch_size=8, embed_dim=512, depth=24)


def init_xcit_params(seed: int, cfg: XCiTConfig) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    d = cfg.embed_dim
    p: dict[str, np.ndarray] = {}

    def lin(name, out_c, in_c, bias=True):
        p[name + ".weight"] = (rng.standard_normal((out_c, in_c))
                               * 0.02).astype(np.float32)
        if bias:
            p[name + ".bias"] = np.zeros((out_c,), np.float32)

    def ln(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)

    def bn(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)
        p[name + ".running_mean"] = np.zeros((c,), np.float32)
        p[name + ".running_var"] = np.ones((c,), np.float32)

    # ConvPatchEmbed: proj.{0,2,4,6} are conv3x3(Conv2d+BN); odd = GELU
    in_c = 3
    for si, out_c in enumerate(cfg.conv_stage_channels):
        pre = f"patch_embed.proj.{2 * si}."
        fan = in_c * 9
        p[pre + "0.weight"] = (rng.standard_normal((out_c, in_c, 3, 3))
                               * math.sqrt(2.0 / fan)).astype(np.float32)
        bn(pre + "1", out_c)
        in_c = out_c

    p["cls_token"] = (rng.standard_normal((1, 1, d)) * 0.02).astype(
        np.float32)
    lin("pos_embeder.token_projection", d, 2 * cfg.pos_hidden_dim)
    # token_projection is a 1x1 Conv2d: weight [d, 2*hidden, 1, 1]
    p["pos_embeder.token_projection.weight"] = p[
        "pos_embeder.token_projection.weight"].reshape(
            d, 2 * cfg.pos_hidden_dim, 1, 1)

    hidden = int(d * cfg.mlp_ratio)
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        ln(pre + "norm1", d)
        lin(pre + "attn.qkv", 3 * d, d, bias=cfg.qkv_bias)
        p[pre + "attn.temperature"] = np.ones((cfg.num_heads, 1, 1),
                                              np.float32)
        lin(pre + "attn.proj", d, d)
        ln(pre + "norm3", d)
        p[pre + "local_mp.conv1.weight"] = (
            rng.standard_normal((d, 1, 3, 3)) * math.sqrt(2.0 / 9)
        ).astype(np.float32)
        p[pre + "local_mp.conv1.bias"] = np.zeros((d,), np.float32)
        bn(pre + "local_mp.bn", d)
        p[pre + "local_mp.conv2.weight"] = (
            rng.standard_normal((d, 1, 3, 3)) * math.sqrt(2.0 / 9)
        ).astype(np.float32)
        p[pre + "local_mp.conv2.bias"] = np.zeros((d,), np.float32)
        ln(pre + "norm2", d)
        lin(pre + "mlp.fc1", hidden, d)
        lin(pre + "mlp.fc2", d, hidden)
        for g in ("gamma1", "gamma2", "gamma3"):
            p[pre + g] = np.full((d,), cfg.eta, np.float32)
    for i in range(cfg.cls_attn_layers):
        pre = f"cls_attn_blocks.{i}."
        ln(pre + "norm1", d)
        lin(pre + "attn.qkv", 3 * d, d, bias=cfg.qkv_bias)
        lin(pre + "attn.proj", d, d)
        ln(pre + "norm2", d)
        lin(pre + "mlp.fc1", hidden, d)
        lin(pre + "mlp.fc2", d, hidden)
        p[pre + "gamma1"] = np.full((d,), cfg.eta, np.float32)
        p[pre + "gamma2"] = np.full((d,), cfg.eta, np.float32)
    ln("norm", d)
    return {k: jnp.asarray(v) for k, v in p.items()}


from tpu_ac.ops.linear import (  # noqa: E402
    bn_inference_nchw as _bn_inference,
    torch_linear as _linear,
)


def conv_patch_embed(params: Params, images: jnp.ndarray, cfg: XCiTConfig,
                     precision) -> tuple[jnp.ndarray, tuple[int, int]]:
    """[B, 3, H, W] -> (tokens [B, N, D], (Hp, Wp))."""
    x = images
    n_stages = len(cfg.conv_stage_channels)
    for si in range(n_stages):
        pre = f"patch_embed.proj.{2 * si}."
        x = jax.lax.conv_general_dilated(
            x, params[pre + "0.weight"], window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision)
        x = _bn_inference(params, pre + "1", x, cfg.bn_eps)
        if si < n_stages - 1:
            x = jax.nn.gelu(x, approximate=False)
    b, d, hp, wp = x.shape
    return x.reshape(b, d, hp * wp).transpose(0, 2, 1), (hp, wp)


def positional_encoding_fourier(params: Params, hp: int, wp: int,
                                cfg: XCiTConfig) -> jnp.ndarray:
    """Fixed 2D sinusoids -> 1x1-conv projection -> [1, Hp*Wp, D]."""
    hidden = cfg.pos_hidden_dim
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(1, hp + 1, dtype=jnp.float32)[:, None]
         / (hp + eps) * scale)                       # cumsum/norm of ones
    x = (jnp.arange(1, wp + 1, dtype=jnp.float32)[None, :]
         / (wp + eps) * scale)
    y = jnp.broadcast_to(y, (hp, wp))
    x = jnp.broadcast_to(x, (hp, wp))
    dim_t = jnp.arange(hidden, dtype=jnp.float32)
    dim_t = cfg.pos_temperature ** (2 * (dim_t // 2) / hidden)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    # interleave sin/cos over pairs (official stack+flatten layout)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(
                           hp, wp, hidden)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(
                           hp, wp, hidden)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)   # [Hp, Wp, 2*hidden]
    w = params["pos_embeder.token_projection.weight"][:, :, 0, 0]
    proj = pos @ w.T + params["pos_embeder.token_projection.bias"]
    return proj.reshape(1, hp * wp, cfg.embed_dim)


def xca(params: Params, pre: str, x: jnp.ndarray, cfg: XCiTConfig,
        precision) -> jnp.ndarray:
    """Cross-covariance attention: [dh, N] x [N, dh] per head, softmax over
    channels, scaled by a learnable per-head temperature."""
    b, n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = _linear(x, params[pre + "attn.qkv.weight"],
                  params.get(pre + "attn.qkv.bias"), precision)
    qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 4, 1)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, h, hd, N]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    attn = jax.lax.dot_general(
        q, k, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        precision=precision)
    attn = attn * params[pre + "attn.temperature"]
    attn = jax.nn.softmax(attn, axis=-1)              # [B, h, hd, hd]
    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        precision=precision)                           # [B, h, hd, N]
    out = out.transpose(0, 3, 1, 2).reshape(b, n, d)
    return _linear(out, params[pre + "attn.proj.weight"],
                   params[pre + "attn.proj.bias"], precision)


def lpi(params: Params, pre: str, x: jnp.ndarray, hp: int, wp: int,
        cfg: XCiTConfig, precision) -> jnp.ndarray:
    """Local patch interaction: depthwise conv3x3 -> GELU -> BN ->
    depthwise conv3x3 over the token grid."""
    b, n, d = x.shape
    g = x.transpose(0, 2, 1).reshape(b, d, hp, wp)

    def dwconv(g, w, bias):
        y = jax.lax.conv_general_dilated(
            g, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=d, precision=precision)
        return y + bias[None, :, None, None]

    g = dwconv(g, params[pre + "local_mp.conv1.weight"],
               params[pre + "local_mp.conv1.bias"])
    g = jax.nn.gelu(g, approximate=False)
    g = _bn_inference(params, pre + "local_mp.bn", g, cfg.bn_eps)
    g = dwconv(g, params[pre + "local_mp.conv2.weight"],
               params[pre + "local_mp.conv2.bias"])
    return g.reshape(b, d, n).transpose(0, 2, 1)


def _mlp(params: Params, pre: str, x: jnp.ndarray, precision) -> jnp.ndarray:
    y = _linear(x, params[pre + "mlp.fc1.weight"],
                params[pre + "mlp.fc1.bias"], precision)
    y = jax.nn.gelu(y, approximate=False)
    return _linear(y, params[pre + "mlp.fc2.weight"],
                   params[pre + "mlp.fc2.bias"], precision)


def xca_block(params: Params, i: int, x: jnp.ndarray, hp: int, wp: int,
              cfg: XCiTConfig, precision) -> jnp.ndarray:
    pre = f"blocks.{i}."
    y = layernorm(x, params[pre + "norm1.weight"],
                  params[pre + "norm1.bias"], cfg.ln_eps)
    x = x + params[pre + "gamma1"] * xca(params, pre, y, cfg, precision)
    y = layernorm(x, params[pre + "norm3.weight"],
                  params[pre + "norm3.bias"], cfg.ln_eps)
    x = x + params[pre + "gamma3"] * lpi(params, pre, y, hp, wp, cfg,
                                         precision)
    y = layernorm(x, params[pre + "norm2.weight"],
                  params[pre + "norm2.bias"], cfg.ln_eps)
    x = x + params[pre + "gamma2"] * _mlp(params, pre, y, precision)
    return x


def class_attention(params: Params, pre: str, x: jnp.ndarray,
                    cfg: XCiTConfig, precision) -> jnp.ndarray:
    """CLS-query attention over all tokens; patch tokens pass through."""
    b, n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = _linear(x, params[pre + "attn.qkv.weight"],
                  params.get(pre + "attn.qkv.bias"), precision)
    qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, h, N, hd]
    qc = q[:, :, :1]                                  # CLS query
    attn = jnp.sum(qc * k, axis=-1) * (hd ** -0.5)    # [B, h, N]
    attn = jax.nn.softmax(attn, axis=-1)
    cls_tok = jnp.einsum("bhn,bhnd->bhd", attn, v,
                         precision=precision).reshape(b, 1, d)
    cls_tok = _linear(cls_tok, params[pre + "attn.proj.weight"],
                      params[pre + "attn.proj.bias"], precision)
    return jnp.concatenate([cls_tok, x[:, 1:]], axis=1)


def cls_attn_block(params: Params, i: int, x: jnp.ndarray, cfg: XCiTConfig,
                   precision) -> jnp.ndarray:
    pre = f"cls_attn_blocks.{i}."
    y = layernorm(x, params[pre + "norm1.weight"],
                  params[pre + "norm1.bias"], cfg.ln_eps)
    x = x + params[pre + "gamma1"] * class_attention(params, pre, y, cfg,
                                                     precision)
    if cfg.tokens_norm:
        x = layernorm(x, params[pre + "norm2.weight"],
                      params[pre + "norm2.bias"], cfg.ln_eps)
    else:
        cls_n = layernorm(x[:, :1], params[pre + "norm2.weight"],
                          params[pre + "norm2.bias"], cfg.ln_eps)
        x = jnp.concatenate([cls_n, x[:, 1:]], axis=1)
    # official-code quirk: the residual adds the FULL concatenated tensor,
    # doubling the patch tokens — kept for checkpoint fidelity.
    x_res = x
    cls_tok = params[pre + "gamma2"] * _mlp(params, pre, x[:, :1],
                                            precision)
    x = jnp.concatenate([cls_tok, x[:, 1:]], axis=1)
    return x_res + x


def xcit_forward(params: Params, images: jnp.ndarray, cfg: XCiTConfig,
                 *, taps: Sequence[int] = (),
                 precision=jax.lax.Precision.HIGHEST) -> dict:
    """Run the trunk; returns {tap_index: [B, N, D]} block outputs plus
    -1 = final CLS-attended, norm'd token tensor [B, 1+N, D]."""
    x, (hp, wp) = conv_patch_embed(params, images, cfg, precision)
    # the sinusoids are generated in f32 regardless of compute dtype; cast
    # at the add so a bf16 trunk stays bf16 (mixed-dtype inputs abort the
    # depthwise convs in lpi under the bfloat16 embed path)
    x = x + positional_encoding_fourier(params, hp, wp, cfg).astype(x.dtype)
    taps = tuple(taps)
    out: dict[int, jnp.ndarray] = {}
    depth = (max(taps) + 1) if taps else cfg.depth
    for i in range(depth):
        x = xca_block(params, i, x, hp, wp, cfg, precision)
        if i in taps:
            out[i] = x
    if not taps:
        b = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"],
                               (b, 1, cfg.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        for i in range(cfg.cls_attn_layers):
            x = cls_attn_block(params, i, x, cfg, precision)
        x = layernorm(x, params["norm.weight"], params["norm.bias"],
                      cfg.ln_eps)
        out[-1] = x
    return out


def xcit_cls_forward(params: Params, images: jnp.ndarray, cfg: XCiTConfig,
                     precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Full forward -> CLS feature [B, D] (hub num_classes=0 semantics)."""
    return xcit_forward(params, images, cfg, precision=precision)[-1][:, 0]
