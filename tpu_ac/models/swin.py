"""Swin Transformer, functional and TPU-first.

Backbone family for the registry names ``vit_swin_base`` /
``vit_swin_large`` (reference backbones.py:42-43,
``timm.create_model("swin_{base,large}_patch4_window7_224")``).

Design notes:
- Window partition/reverse are pure static reshapes; the shifted-window
  case is ``jnp.roll`` + a precomputed additive attention mask — no
  dynamic shapes, everything tiles onto the MXU as [nW*B, 49, C] batched
  matmuls.
- The relative-position bias is gathered from the (2w-1)^2 table with a
  precomputed [w^2, w^2] index; the checkpoint's buffered
  ``relative_position_index`` is ignored (it is a pure function of the
  window size, recomputed here).
- Param keys follow the microsoft/timm state dict
  (``layers.{i}.blocks.{j}.attn.qkv.weight``,
  ``layers.{i}.downsample.reduction.weight``, ...), so released
  checkpoints convert as array copies.
- Taps: ``taps=("layers.1", ...)`` return each stage's block output
  (before its PatchMerging downsample) as a [B, C, H, W] grid.  NOTE the
  reference's clustering ``_embed`` cannot actually consume swin features
  (its 3-D branch drops a "CLS" token swin does not have,
  patchcore.py:377-383, and the resulting length is not square) — the
  registry entry there is effectively dead; we make the taps usable
  instead (see PARITY.md).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.normalize import layernorm

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    window_size: int = 7
    embed_dim: int = 128
    depths: tuple[int, ...] = (2, 2, 18, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-5

    @property
    def stage_dims(self) -> tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i)
                     for i in range(len(self.depths)))


SWIN_TINY = SwinConfig(embed_dim=96, depths=(2, 2, 6, 2),
                       num_heads=(3, 6, 12, 24))
SWIN_SMALL = SwinConfig(embed_dim=96, depths=(2, 2, 18, 2),
                        num_heads=(3, 6, 12, 24))
SWIN_BASE = SwinConfig()  # swin_base_patch4_window7_224
SWIN_LARGE = SwinConfig(embed_dim=192, num_heads=(6, 12, 24, 48))


def init_swin_params(seed: int, cfg: SwinConfig) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    def lin(name, out_c, in_c, bias=True):
        p[name + ".weight"] = (rng.standard_normal((out_c, in_c))
                               * 0.02).astype(np.float32)
        if bias:
            p[name + ".bias"] = np.zeros((out_c,), np.float32)

    def ln(name, c):
        p[name + ".weight"] = np.ones((c,), np.float32)
        p[name + ".bias"] = np.zeros((c,), np.float32)

    d0 = cfg.embed_dim
    p["patch_embed.proj.weight"] = (
        rng.standard_normal((d0, 3, cfg.patch_size, cfg.patch_size))
        * math.sqrt(1.0 / (3 * cfg.patch_size ** 2))).astype(np.float32)
    p["patch_embed.proj.bias"] = np.zeros((d0,), np.float32)
    ln("patch_embed.norm", d0)

    w2 = (2 * cfg.window_size - 1) ** 2
    for li, (depth, nh) in enumerate(zip(cfg.depths, cfg.num_heads)):
        d = cfg.stage_dims[li]
        hidden = int(d * cfg.mlp_ratio)
        for b in range(depth):
            pre = f"layers.{li}.blocks.{b}."
            ln(pre + "norm1", d)
            lin(pre + "attn.qkv", 3 * d, d, bias=cfg.qkv_bias)
            lin(pre + "attn.proj", d, d)
            p[pre + "attn.relative_position_bias_table"] = (
                rng.standard_normal((w2, nh)) * 0.02).astype(np.float32)
            ln(pre + "norm2", d)
            lin(pre + "mlp.fc1", hidden, d)
            lin(pre + "mlp.fc2", d, hidden)
        if li < len(cfg.depths) - 1:
            pre = f"layers.{li}.downsample."
            ln(pre + "norm", 4 * d)
            lin(pre + "reduction", 2 * d, 4 * d, bias=False)
    ln("norm", cfg.stage_dims[-1])
    return {k: jnp.asarray(v) for k, v in p.items()}


from tpu_ac.ops.linear import torch_linear as _linear  # noqa: E402


def relative_position_index(w: int) -> np.ndarray:
    """[w^2, w^2] indices into the (2w-1)^2 bias table (a pure function of
    the window size — the checkpoint buffer is redundant)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    """[B*nW, w*w, C] -> [B, H, W, C]."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, c)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(h: int, ww: int, w: int, shift: int) -> np.ndarray:
    """Additive attention mask [nW, w^2, w^2] for shifted windows: tokens
    from different pre-roll regions must not attend to each other.

    Pure host numpy (NOT the jnp ``_window_partition``): this runs at
    TRACE time inside every shifted block, and an eager device dispatch +
    blocking fetch there costs a ~30 ms remote round trip per block; the
    lru_cache also stops rebuilding the identical mask for every shifted
    block of a stage."""
    img = np.zeros((h, ww), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    windows = (img.reshape(h // w, w, ww // w, w)
               .transpose(0, 2, 1, 3).reshape(-1, w * w))
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(params: Params, pre: str, x: jnp.ndarray, nh: int,
                      w: int, mask: jnp.ndarray | None,
                      precision) -> jnp.ndarray:
    """x: [nWB, w*w, C] windows -> attended windows."""
    nwb, n, c = x.shape
    hd = c // nh
    qkv = _linear(x, params[pre + "attn.qkv.weight"],
                  params.get(pre + "attn.qkv.bias"), precision)
    qkv = qkv.reshape(nwb, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [nWB, nh, n, hd]
    attn = jax.lax.dot_general(
        q, k, dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        precision=precision) * (hd ** -0.5)
    idx = jnp.asarray(relative_position_index(w).reshape(-1))
    bias = params[pre + "attn.relative_position_bias_table"][idx]
    bias = bias.reshape(n, n, nh).transpose(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(nwb // nw, nw, nh, n, n) + mask[:, None]
        attn = attn.reshape(nwb, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return _linear(out, params[pre + "attn.proj.weight"],
                   params[pre + "attn.proj.bias"], precision)


def _swin_block(params: Params, pre: str, x: jnp.ndarray, nh: int,
                w: int, shift: int, cfg: SwinConfig,
                precision) -> jnp.ndarray:
    """x: [B, H, W, C]."""
    b, h, ww, c = x.shape
    y = layernorm(x, params[pre + "norm1.weight"],
                  params[pre + "norm1.bias"], cfg.ln_eps)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shifted_window_mask(h, ww, w, shift))
    else:
        mask = None
    windows = _window_partition(y, w)
    attended = _window_attention(params, pre, windows, nh, w, mask,
                                 precision)
    y = _window_reverse(attended, w, h, ww)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    x = x + y
    y = layernorm(x, params[pre + "norm2.weight"],
                  params[pre + "norm2.bias"], cfg.ln_eps)
    y = _linear(y, params[pre + "mlp.fc1.weight"],
                params[pre + "mlp.fc1.bias"], precision)
    y = jax.nn.gelu(y, approximate=False)
    y = _linear(y, params[pre + "mlp.fc2.weight"],
                params[pre + "mlp.fc2.bias"], precision)
    return x + y


def _patch_merging(params: Params, pre: str, x: jnp.ndarray,
                   cfg: SwinConfig, precision) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 2C] (timm PatchMerging order)."""
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = layernorm(x, params[pre + "norm.weight"],
                  params[pre + "norm.bias"], cfg.ln_eps)
    return _linear(x, params[pre + "reduction.weight"], None, precision)


def swin_forward(params: Params, images: jnp.ndarray, cfg: SwinConfig,
                 *, taps: Sequence[str] = (),
                 precision=jax.lax.Precision.HIGHEST
                 ) -> dict[str, jnp.ndarray]:
    """Run the trunk, returning {"layers.i": [B, C_i, H_i, W_i]} grids for
    tapped stages (pre-downsample) plus "final" = the norm'd token grid.

    Stops after the deepest tapped stage (the reference aborts its
    forward from the last hook, common.py:262-268).
    """
    taps = tuple(taps)
    tap_idx = {int(t.split(".")[1]) for t in taps}
    deepest = max(tap_idx) if tap_idx else len(cfg.depths) - 1

    b, _, h, w_img = images.shape
    ps, w = cfg.patch_size, cfg.window_size
    x = jax.lax.conv_general_dilated(
        images, params["patch_embed.proj.weight"], window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision)
    x = x + params["patch_embed.proj.bias"][None, :, None, None]
    x = x.transpose(0, 2, 3, 1)  # [B, H, W, C]
    x = layernorm(x, params["patch_embed.norm.weight"],
                  params["patch_embed.norm.bias"], cfg.ln_eps)

    out: dict[str, jnp.ndarray] = {}
    for li, (depth, nh) in enumerate(zip(cfg.depths, cfg.num_heads)):
        if li > deepest and taps:
            return out
        gh, gw = x.shape[1], x.shape[2]
        if gh % w or gw % w:
            raise ValueError(
                f"stage {li} grid {gh}x{gw} not divisible by window {w}")
        for bi in range(depth):
            # upstream Swin disables the shift when the grid is no larger
            # than the window (min(input_resolution) <= window_size ->
            # shift_size = 0) — at 224px the last stage is a single 7x7
            # window, so its odd blocks attend unshifted
            shift = 0 if (bi % 2 == 0 or min(gh, gw) <= w) else w // 2
            x = _swin_block(params, f"layers.{li}.blocks.{bi}.", x, nh, w,
                            shift, cfg, precision)
        if li in tap_idx:
            out[f"layers.{li}"] = x.transpose(0, 3, 1, 2)
        if li < len(cfg.depths) - 1:
            x = _patch_merging(params, f"layers.{li}.downsample.", x, cfg,
                               precision)
    x = layernorm(x, params["norm.weight"], params["norm.bias"],
                  cfg.ln_eps)
    out["final"] = x.transpose(0, 3, 1, 2)
    return out
