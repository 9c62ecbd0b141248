"""Fused multi-head attention (Pallas, TPU).

Replaces the reference ViT's dense attention
(Anomaly-Clustering/models/patchcore/vision_transformer.py:85-89), which
materializes softmax(QK^T) per head in HBM.  At ViT sequence lengths
(S = 785 for 224px / patch 8) the whole K/V of one (batch, head) pair fits
in VMEM, so the kernel is a single-pass tile: scores for a TQ-row query
block live only in VMEM and the [S, S] matrix never touches HBM.

Layout: grid (B*H, S_pad/TQ); per step the kernel sees
q [TQ, Dh], k/v [S_pad, Dh] and writes out [TQ, Dh].  S is padded to the
f32 sublane tile (multiples of 8/128 as needed); padded key columns are
masked with -inf before the softmax, padded query rows are garbage that the
caller slices off.

Matmuls run on the MXU with f32 accumulation (preferred_element_type);
pass bf16 q/k/v for speed-of-light throughput, f32 for parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, s_valid: int):
    q = q_ref[0]  # [TQ, Dh]
    k = k_ref[0]  # [S_pad, Dh]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s_pad = k.shape[0]
    if s_pad != s_valid:  # static mask over padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < s_valid, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("scale", "q_tile", "s_valid", "interpret"))
def _fused_attention_padded(q, k, v, *, scale: float, q_tile: int,
                            s_valid: int, interpret: bool):
    bh, s_pad, dh = q.shape
    grid = (bh, s_pad // q_tile)
    kernel = functools.partial(_attn_kernel, scale=scale, s_valid=s_valid)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, dh), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, q_tile, dh), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, dh), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, dh), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, q_tile, dh), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, k, v)


# jit static kwargs can't take jnp dtypes cleanly across versions; resolve
# interpret-mode from the backend once at import.
def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, *, q_tile: int = 128,
                    interpret: bool | None = None) -> jnp.ndarray:
    """softmax(q k^T * scale) v for [B, H, S, Dh] tensors.

    Drop-in ``attention_impl`` for tpu_ac.models.vit.block_forward.  Pads S
    and Dh to TPU tiles, masks padded keys, runs the Pallas kernel, slices
    back.  On non-TPU backends it falls back to interpreter mode (tests).
    """
    if interpret is None:
        interpret = _default_interpret()
    b, h, s, dh = q.shape
    s_pad = _round_up(s, max(q_tile, 128))
    dh_pad = _round_up(dh, 128)

    def prep(x):
        x = x.reshape(b * h, s, dh)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, dh_pad - dh)))

    out = _fused_attention_padded(
        prep(q), prep(k), prep(v), scale=float(scale), q_tile=q_tile,
        s_valid=s, interpret=interpret)
    return out[:, :s, :dh].reshape(b, h, s, dh)
