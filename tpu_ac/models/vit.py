"""DINO-compatible Vision Transformer, TPU-first.

Functional re-design of the reference's vendored DINO ViT
(Anomaly-Clustering/models/patchcore/vision_transformer.py:68-254 and
dino-main/vision_transformer.py): instead of nn.Modules + forward hooks, the
forward is a pure function over a flat params dict and *returns* the tapped
block outputs — the JAX-native replacement for the reference's
NetworkFeatureAggregator hook machinery (common.py:211-274).

TPU notes:
- patch embedding is evaluated as space-to-depth + one big [B*N, C*ps*ps] x
  [C*ps*ps, D] matmul (MXU) rather than a conv — identical math, better
  layout;
- attention is softmax(QK^T * scale)V per head; at seq len 785 XLA's fused
  dense attention is the fastest measured implementation (it beat a
  hand-written Pallas kernel in f32 and bf16); a custom callable can be
  swapped in via ``attention_impl`` for experimentation;
- parameters keep torch (out, in) layout; matmuls contract against the
  trailing axis of the weight (x @ W^T) which XLA folds with no copies.

Param keys mirror the torch state_dict of the released DINO checkpoints
(e.g. ``blocks.3.attn.qkv.weight``), making checkpoint conversion a
mechanical array copy (tpu_ac/models/convert.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.interpolate import interpolate_bicubic
from tpu_ac.ops.normalize import layernorm

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    img_size: int = 224  # pretraining image size (defines pos_embed length)
    num_prefix_tokens: int = 1  # 2 for DeiT-distilled (CLS + dist token)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.head_dim ** -0.5


# Factories mirroring vision_transformer.py:236-254.
VIT_TINY = ViTConfig(embed_dim=192, num_heads=3)
VIT_SMALL = ViTConfig(embed_dim=384, num_heads=6)
VIT_BASE = ViTConfig(embed_dim=768, num_heads=12)
VIT_LARGE = ViTConfig(embed_dim=1024, depth=24, num_heads=16)


def _trunc_normal_np(rng: np.random.Generator, shape, std=0.02, a=-2.0, b=2.0):
    """trunc_normal_ init (utils.py:181-219): inverse-CDF of a truncated normal."""
    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    l, u = norm_cdf(a / std), norm_cdf(b / std)
    x = rng.uniform(2 * l - 1, 2 * u - 1, size=shape)
    from scipy.special import erfinv

    x = erfinv(x) * std * math.sqrt(2.0)
    # a/b are ABSOLUTE bounds like the reference's (utils.py:528-544):
    # at std=0.02 the +-2.0 clamp is a no-op and the init is effectively a
    # plain normal — clipping at a*std would censor ~4.6% at +-2 sigma
    return np.clip(x, a, b).astype(np.float32)


def init_vit_params(seed: int, cfg: ViTConfig) -> dict[str, jnp.ndarray]:
    """Random init matching the reference's _init_weights scheme."""
    rng = np.random.default_rng(seed)
    d = cfg.embed_dim
    p: dict[str, np.ndarray] = {}
    p["cls_token"] = _trunc_normal_np(rng, (1, 1, d))
    if cfg.num_prefix_tokens > 1:
        p["dist_token"] = _trunc_normal_np(rng, (1, 1, d))
    p["pos_embed"] = _trunc_normal_np(
        rng, (1, cfg.num_patches + cfg.num_prefix_tokens, d))
    p["patch_embed.proj.weight"] = (
        rng.standard_normal((d, 3, cfg.patch_size, cfg.patch_size)) *
        math.sqrt(1.0 / (3 * cfg.patch_size ** 2))
    ).astype(np.float32)
    p["patch_embed.proj.bias"] = np.zeros((d,), np.float32)
    hidden = int(d * cfg.mlp_ratio)
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        p[pre + "norm1.weight"] = np.ones((d,), np.float32)
        p[pre + "norm1.bias"] = np.zeros((d,), np.float32)
        p[pre + "attn.qkv.weight"] = _trunc_normal_np(rng, (3 * d, d))
        if cfg.qkv_bias:
            p[pre + "attn.qkv.bias"] = np.zeros((3 * d,), np.float32)
        p[pre + "attn.proj.weight"] = _trunc_normal_np(rng, (d, d))
        p[pre + "attn.proj.bias"] = np.zeros((d,), np.float32)
        p[pre + "norm2.weight"] = np.ones((d,), np.float32)
        p[pre + "norm2.bias"] = np.zeros((d,), np.float32)
        p[pre + "mlp.fc1.weight"] = _trunc_normal_np(rng, (hidden, d))
        p[pre + "mlp.fc1.bias"] = np.zeros((hidden,), np.float32)
        p[pre + "mlp.fc2.weight"] = _trunc_normal_np(rng, (d, hidden))
        p[pre + "mlp.fc2.bias"] = np.zeros((d,), np.float32)
    p["norm.weight"] = np.ones((d,), np.float32)
    p["norm.bias"] = np.zeros((d,), np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


from tpu_ac.ops.linear import torch_linear as _linear  # noqa: E402


def patch_embed(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Conv(ps, stride=ps) patch projection as space-to-depth + matmul.

    images: [B, 3, H, W] -> tokens [B, N, D].  Flatten order of each patch is
    (c, kh, kw), matching the conv weight layout [D, 3, ps, ps].
    """
    b, c, h, w = images.shape
    ps = cfg.patch_size
    gh, gw = h // ps, w // ps
    x = images.reshape(b, c, gh, ps, gw, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * ps * ps)
    w_flat = params["patch_embed.proj.weight"].reshape(cfg.embed_dim, -1)
    return _linear(x, w_flat, params["patch_embed.proj.bias"], precision)


def interpolate_pos_encoding(params: Params, npatch: int, h: int, w: int,
                             cfg: ViTConfig) -> jnp.ndarray:
    """Bicubic pos-embed resize for non-pretraining image sizes
    (vision_transformer.py:174-194), incl. the +0.1 scale fudge.

    Axis orientation: the token grid is row-major (H rows of W), so the
    interpolation's leading (row) scale comes from the image HEIGHT.  The
    reference gets this right through misnamed variables — its
    prepare_tokens unpacks ``B, nc, w, h = x.shape`` so the "w" it passes
    is really shape[2], the height."""
    pos_embed = params["pos_embed"]
    n_prefix = cfg.num_prefix_tokens
    n = pos_embed.shape[1] - n_prefix
    if npatch == n and w == h:
        return pos_embed
    dim = pos_embed.shape[-1]
    class_pos = pos_embed[:, :n_prefix]
    patch_pos = pos_embed[:, n_prefix:]
    h0 = h // cfg.patch_size + 0.1
    w0 = w // cfg.patch_size + 0.1
    side = int(math.sqrt(n))
    grid = patch_pos.reshape(1, side, side, dim).transpose(0, 3, 1, 2)
    grid = interpolate_bicubic(
        grid, scale_factor=(h0 / side, w0 / side))
    grid = grid.transpose(0, 2, 3, 1).reshape(1, -1, dim)
    return jnp.concatenate([class_pos, grid], axis=1)


def prepare_tokens(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                   precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    b, _, h, w = images.shape
    x = patch_embed(params, images, cfg, precision)
    prefix = [jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))]
    if cfg.num_prefix_tokens > 1:
        prefix.append(jnp.broadcast_to(params["dist_token"],
                                       (b, 1, cfg.embed_dim)))
    x = jnp.concatenate(prefix + [x], axis=1)
    return x + interpolate_pos_encoding(
        params, x.shape[1] - cfg.num_prefix_tokens, h, w, cfg)


# Pad ragged sequence lengths inside attention only: q rows to a sublane
# multiple (8) and keys/values to a lane multiple (128), with -1e9 bias on
# padded keys (exact — softmax assigns them zero mass) and the padded q
# rows sliced back off.  Unlike vit_forward(seq_pad=True) it does NOT
# inflate the (much larger) QKV/MLP matmuls.  MEASURED A WASH on v5e at
# the flagship shape (batch-32 ViT-B/8 embed: 127.6 ms padded vs 126.1
# unpadded — XLA's emitter already handles the ragged S=785, and the
# attention cost is the [B,H,S,S] HBM round trip, not tiling), so the
# default stays off; the path is exactness-tested and available for
# other shapes.  Like the other perf toggles this reads an env var at
# import (TPU_AC_ATTENTION_PAD_RAGGED=1); NOTE both flags are read at
# TRACE time — flipping them after a function has jit-compiled keeps the
# old graph for already-seen shapes.
import os as _os

ATTENTION_PAD_RAGGED = _os.environ.get(
    "TPU_AC_ATTENTION_PAD_RAGGED", "0") == "1"

# Compute q/k/v as three sliced projections instead of one packed matmul +
# 5-D transpose: identical math, but XLA fuses the three
# [B,N,nh,hd]->[B,nh,N,hd] transposes instead of materializing a [B,N,3D]
# layout copy of the packed output.  The weight slices are static-index
# views: constants on the unrolled path, per-iteration slices of the
# scan-carried stacked weight under scan_blocks (where the measured win
# was taken — batch-32 ViT-B/8 bf16 embed: 119.6 vs 125.5 ms on v5e).
# Disable with TPU_AC_QKV_SPLIT=0 (read at import; trace-time caveat as
# above).
QKV_SPLIT = _os.environ.get("TPU_AC_QKV_SPLIT", "1") != "0"


def _attention_xla(q, k, v, scale, precision, attn_bias=None):
    """Dense softmax(QK^T)V — XLA fuses this well at ViT sequence lengths.

    ``attn_bias`` (broadcastable to the [B, H, N, N] logits, typically
    [1, 1, 1, N] with -1e9 over padded keys) masks dead tokens when the
    sequence is padded to a lane-aligned length.
    """
    s_q = q.shape[2]
    s_kv = k.shape[2]
    pad_q = (-s_q) % 8 if ATTENTION_PAD_RAGGED else 0
    pad_kv = (-s_kv) % 128 if ATTENTION_PAD_RAGGED else 0
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        kv_bias = jnp.where(jnp.arange(s_kv + pad_kv) < s_kv, 0.0,
                            -1e9).astype(q.dtype)[None, None, None, :]
        if attn_bias is not None:  # align an incoming key mask first
            attn_bias = jnp.pad(
                attn_bias, [(0, 0)] * (attn_bias.ndim - 1) + [(0, pad_kv)])
        attn_bias = kv_bias if attn_bias is None else attn_bias + kv_bias
    attn = jax.lax.dot_general(
        q, k, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        precision=precision) * scale
    if attn_bias is not None:
        attn = attn + attn_bias
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        precision=precision)
    if pad_q or pad_kv:
        out = out[:, :, :s_q]
        attn = attn[:, :, :s_q, :s_kv]
    return out, attn


def block_forward(params: Params, i: int, x: jnp.ndarray, cfg: ViTConfig,
                  precision=jax.lax.Precision.HIGHEST,
                  attention_impl: Callable | None = None,
                  return_attention: bool = False,
                  attn_bias: jnp.ndarray | None = None,
                  return_attention_and_output: bool = False) -> jnp.ndarray:
    """One pre-LN transformer block (vision_transformer.py:95-113).

    ``return_attention`` returns only the [B, nh, N, N] softmax map (the
    reference Block's return_attention=True).  ``return_attention_and_output``
    returns ``(attention, block_output)`` from ONE evaluation — the
    structural guarantee vit_all_selfattentions needs (no reliance on XLA
    CSE'ing a paired call).
    """
    pre = f"blocks.{i}."
    b, n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    y = layernorm(x, params[pre + "norm1.weight"], params[pre + "norm1.bias"],
                  cfg.ln_eps)
    if QKV_SPLIT:
        # three per-tensor projections from slices of the packed qkv
        # weight (identical math; the slices constant-fold at trace time):
        # gives XLA one [B,N,nh,hd]->[B,nh,N,hd] transpose per tensor to
        # fuse instead of the 5-D reshape+transpose of the packed output,
        # which materialized an extra [B,N,3D] layout copy in the profile
        w = params[pre + "attn.qkv.weight"]
        bias = params.get(pre + "attn.qkv.bias")

        def proj(idx):
            out = _linear(y, w[idx * d:(idx + 1) * d],
                          None if bias is None else bias[idx * d:(idx + 1) * d],
                          precision)
            return out.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = proj(0), proj(1), proj(2)  # each [B, nh, N, hd]
    else:
        qkv = _linear(y, params[pre + "attn.qkv.weight"],
                      params.get(pre + "attn.qkv.bias"), precision)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # each [B, nh, N, hd]

    need_attn = return_attention or return_attention_and_output
    if attention_impl is not None and not need_attn and (
            attn_bias is None
            or getattr(attention_impl, "handles_mask", False)):
        if getattr(attention_impl, "handles_mask", False):
            out = attention_impl(q, k, v, cfg.scale, attn_bias)
        else:
            out = attention_impl(q, k, v, cfg.scale)
        attn = None
    else:
        out, attn = _attention_xla(q, k, v, cfg.scale, precision, attn_bias)
    if return_attention:
        return attn
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = _linear(out, params[pre + "attn.proj.weight"],
                  params[pre + "attn.proj.bias"], precision)
    x = x + out

    y = layernorm(x, params[pre + "norm2.weight"], params[pre + "norm2.bias"],
                  cfg.ln_eps)
    y = _linear(y, params[pre + "mlp.fc1.weight"], params[pre + "mlp.fc1.bias"],
                precision)
    y = jax.nn.gelu(y, approximate=False)
    y = _linear(y, params[pre + "mlp.fc2.weight"], params[pre + "mlp.fc2.bias"],
                precision)
    x = x + y
    if return_attention_and_output:
        return attn, x
    return x


def _remat_policy(remat):
    """None (save nothing) for ``remat=True``; the save-matmul-outputs
    policy for ``remat="dots"`` (recompute only the elementwise chain)."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None


def vit_forward(
    params: Params,
    images: jnp.ndarray,
    cfg: ViTConfig,
    *,
    taps: Sequence[int] = (),
    precision=jax.lax.Precision.HIGHEST,
    attention_impl: Callable | None = None,
    max_depth: int | None = None,
    remat: bool | str = False,
    scan_blocks: bool = False,
    seq_pad: bool = False,
) -> dict[int, jnp.ndarray]:
    """Run the ViT trunk, returning raw block outputs for each tapped index.

    Replaces the hook-based NetworkFeatureAggregator (common.py:211-274):
    tapped values are the block outputs *before* the final norm — exactly
    what a forward hook on ``blocks.i`` observes.  Computation stops after
    the deepest tap (the reference aborts the forward by raising from the
    last hook, common.py:262-268).

    ``remat=True`` checkpoints each block (jax.checkpoint): activations are
    recomputed in the backward pass, trading ~1/3 more FLOPs for O(depth)
    less live memory — the HBM lever for large-batch multi-crop training.
    ``remat="dots"`` uses the ``dots_with_no_batch_dims_saveable`` policy
    instead: matmul outputs are SAVED and only the cheap elementwise chain
    (LayerNorm/GELU/softmax) recomputes — most of full remat's memory win
    at a fraction of its recompute FLOPs.

    ``seq_pad=True`` pads the token stream to the next lane-aligned length
    (multiple of 128) with masked attention: at the flagship S=785
    (6x128+17 — ragged on both the sublane and lane axis of every
    attention tile) the trunk runs on S=896 instead, trading ~14% more
    FLOPs for clean MXU tiling.  Padded keys carry a -1e9 logit bias so
    real-token outputs are EXACTLY those of the unpadded forward; tapped
    outputs are sliced back to the true length.

    Returns {tap_index: [B, N+1, D]}.
    """
    x = prepare_tokens(params, images, cfg, precision)
    n0 = x.shape[1]
    attn_bias = None
    if seq_pad:
        s_pad = -(-n0 // 128) * 128
        if s_pad != n0:
            x = jnp.pad(x, ((0, 0), (0, s_pad - n0), (0, 0)))
            attn_bias = jnp.where(jnp.arange(s_pad) < n0, 0.0, -1e9).astype(
                x.dtype)[None, None, None, :]
    taps = tuple(taps)
    depth = max_depth
    if depth is None:
        depth = (max(taps) + 1) if taps else cfg.depth
    out: dict[int, jnp.ndarray] = {}

    def run_block(i, x):
        return block_forward(params, i, x, cfg, precision, attention_impl,
                             attn_bias=attn_bias)

    if remat:
        run_block = jax.checkpoint(run_block, static_argnums=(0,),
                                   policy=_remat_policy(remat))

    start = 0
    if scan_blocks:
        # lax.scan over the untapped prefix with stacked per-block params:
        # the HLO contains ONE block body instead of `depth` copies, cutting
        # compile time ~depth-fold.  Tapped blocks (typically the last two)
        # stay unrolled so their outputs are plain values.
        prefix_len = min(taps) if taps else depth
        if prefix_len >= 2:
            stacked = _stack_block_params(params, 0, prefix_len)

            def scan_body(x, layer_params):
                merged = {**params, **{
                    f"blocks.0.{k}": v for k, v in layer_params.items()}}
                y = block_forward(merged, 0, x, cfg, precision,
                                  attention_impl, attn_bias=attn_bias)
                return y, None

            body = (jax.checkpoint(scan_body, policy=_remat_policy(remat))
                    if remat else scan_body)
            x, _ = jax.lax.scan(body, x, stacked)
            start = prefix_len

    for i in range(start, depth):
        x = run_block(i, x)
        if i in taps:
            out[i] = x[:, :n0] if x.shape[1] != n0 else x
    last = x[:, :n0] if x.shape[1] != n0 else x
    out[-1] = last  # last computed block output
    return out


_BLOCK_PARAM_SUFFIXES = (
    "norm1.weight", "norm1.bias", "attn.qkv.weight", "attn.qkv.bias",
    "attn.proj.weight", "attn.proj.bias", "norm2.weight", "norm2.bias",
    "mlp.fc1.weight", "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias",
)


def _stack_block_params(params: Params, start: int, end: int
                        ) -> dict[str, jnp.ndarray]:
    """Stack per-block params [end-start, ...] keyed by in-block suffix."""
    out = {}
    for suffix in _BLOCK_PARAM_SUFFIXES:
        key0 = f"blocks.{start}.{suffix}"
        if key0 not in params:
            continue
        out[suffix] = jnp.stack(
            [params[f"blocks.{i}.{suffix}"] for i in range(start, end)])
    return out


def vit_cls_forward(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                    precision=jax.lax.Precision.HIGHEST,
                    attention_impl: Callable | None = None,
                    remat: bool | str = False,
                    scan_blocks: bool = False) -> jnp.ndarray:
    """Full forward -> final norm -> CLS token (vision_transformer.py:209-214)."""
    x = vit_forward(params, images, cfg, precision=precision,
                    attention_impl=attention_impl, max_depth=cfg.depth,
                    remat=remat, scan_blocks=scan_blocks)[-1]
    x = layernorm(x, params["norm.weight"], params["norm.bias"], cfg.ln_eps)
    return x[:, 0]


def vit_intermediate_layers(params: Params, images: jnp.ndarray,
                            cfg: ViTConfig, n: int = 1,
                            precision=jax.lax.Precision.HIGHEST,
                            attention_impl: Callable | None = None) -> list[jnp.ndarray]:
    """get_intermediate_layers (vision_transformer.py:225-233): final-norm'd
    outputs of the last n blocks."""
    taps = tuple(range(cfg.depth - n, cfg.depth))
    outs = vit_forward(params, images, cfg, taps=taps, precision=precision,
                       attention_impl=attention_impl, max_depth=cfg.depth)
    return [
        layernorm(outs[i], params["norm.weight"], params["norm.bias"], cfg.ln_eps)
        for i in taps
    ]


def vit_index_selfattention(params: Params, images: jnp.ndarray,
                            cfg: ViTConfig, index: int,
                            precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Attention map of block ``index`` (the Anomaly-Clustering fork's
    get_index_selfattention, models/patchcore/vision_transformer.py:225-233,
    which visualize_attention.py sweeps over every block)."""
    if not 0 <= index < cfg.depth:
        raise ValueError(f"block index {index} outside depth {cfg.depth}")
    x = prepare_tokens(params, images, cfg, precision)
    for i in range(index):
        x = block_forward(params, i, x, cfg, precision)
    return block_forward(params, index, x, cfg, precision,
                         return_attention=True)


def vit_last_selfattention(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                           precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Attention map of the final block (vision_transformer.py:216-223)."""
    return vit_index_selfattention(params, images, cfg, cfg.depth - 1,
                                   precision)


def vit_all_selfattentions(params: Params, images: jnp.ndarray,
                           cfg: ViTConfig,
                           precision=jax.lax.Precision.HIGHEST
                           ) -> jnp.ndarray:
    """[depth, B, nh, N, N] attention of EVERY block in one forward.

    The Anomaly-Clustering fork's visualize_attention.py:191-194 calls
    get_index_selfattention(img, i) for each i, re-running the whole
    block prefix per index (O(depth^2) blocks).  Here each block is
    evaluated ONCE and returns (attention, output) together
    (block_forward(return_attention_and_output=True)), so the traced
    program is O(depth) by construction — no reliance on XLA CSE of
    paired calls.
    """
    x = prepare_tokens(params, images, cfg, precision)
    attns = []
    for i in range(cfg.depth):
        attn, x = block_forward(params, i, x, cfg, precision,
                                return_attention_and_output=True)
        attns.append(attn)
    return jnp.stack(attns)


def vit_selfattention(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                      block_idx: int,
                      precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Attention map of an arbitrary block (get_index_selfattention,
    dino-main/vision_transformer.py:225-228).  Alias of
    vit_index_selfattention (kept for API stability)."""
    return vit_index_selfattention(params, images, cfg, block_idx, precision)
