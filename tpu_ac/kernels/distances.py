"""Tiled pairwise-distance + row-min Pallas kernel — the alpha hot loop.

The alpha weights need, for a test image i with patches zi [P, D] and every
other image j with patches Z[j] [P, D]:

    mins[j, p] = min_q || zi[p] - Z[j, q] ||        (utils.py:222-237)

The XLA formulation (tpu_ac.cluster.alpha) computes the full [P, N*P]
distance matrix per i — ~90 MB HBM traffic per image at MVTec scale.  This
kernel keeps each [P, P] tile in VMEM, accumulates the q-contraction over D
in a scratch accumulator, and writes only the [P]-vector of row-mins per j:
HBM output shrinks by a factor of P (784x).

Grid: (N, K) — j image outer, D-tile inner (last grid dim iterates
fastest, so the accumulator scratch carries across k for a fixed j).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _min_dists_kernel(zi_ref, bank_ref, a2_ref, b2_ref, out_ref, acc,
                      *, n_k: int, q_valid: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        zi_ref[:], bank_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        a2 = a2_ref[0]     # [P_pad]
        b2 = b2_ref[0, 0]  # [Q_pad]
        d2 = a2[:, None] - 2.0 * acc[:] + b2[None, :]
        if acc.shape[1] != q_valid:  # mask padded bank patches
            col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            d2 = jnp.where(col < q_valid, d2, jnp.inf)
        out_ref[0, 0] = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))


@functools.partial(jax.jit,
                   static_argnames=("d_tile", "q_valid", "interpret"))
def _min_dists_padded(zi, bank, a2, b2, *, d_tile: int, q_valid: int,
                      interpret: bool):
    p_pad, d_pad = zi.shape
    n, q_pad, _ = bank.shape
    n_k = d_pad // d_tile
    kernel = functools.partial(_min_dists_kernel, n_k=n_k, q_valid=q_valid)
    # N-indexed operands carry a singleton middle axis so every block's
    # trailing two dims are full array dims (Mosaic requires the last two
    # block dims divisible by (8, 128) or equal to the array dims).
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, p_pad), jnp.float32),
        grid=(n, n_k),
        in_specs=[
            pl.BlockSpec((p_pad, d_tile), lambda j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, d_tile), lambda j, k: (j, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad), lambda j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_pad), lambda j, k: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, p_pad), lambda j, k: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((p_pad, q_pad), jnp.float32)],
        interpret=interpret,
    )(zi, bank, a2, b2)
    return out[:, 0]


def min_dists_to_sets(zi: jnp.ndarray, bank: jnp.ndarray,
                      *, d_tile: int = 512,
                      interpret: bool | None = None) -> jnp.ndarray:
    """mins[j, p] = min_q ||zi[p] - bank[j, q]|| for zi [P, D], bank [N, Q, D].

    Returns [N, P] float32.  Non-TPU backends run in interpreter mode.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p, d = zi.shape
    n, q, _ = bank.shape
    p_pad = _round_up(p, 128)
    q_pad = _round_up(q, 128)
    d_pad = _round_up(d, d_tile)

    zi_p = jnp.pad(zi.astype(jnp.float32),
                   ((0, p_pad - p), (0, d_pad - d)))
    bank_p = jnp.pad(bank.astype(jnp.float32),
                     ((0, 0), (0, q_pad - q), (0, d_pad - d)))
    a2 = jnp.sum(jnp.square(zi_p), axis=-1)[None]            # [1, P_pad]
    b2 = jnp.sum(jnp.square(bank_p), axis=-1)[:, None, :]    # [N, 1, Q_pad]

    out = _min_dists_padded(zi_p, bank_p, a2, b2, d_tile=d_tile,
                            q_valid=q, interpret=interpret)
    return out[:, :p]
