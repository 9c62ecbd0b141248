"""Tiled pairwise-distance + row-min Pallas kernel — the alpha hot loop.

The alpha weights need, for every test image i with patches Z[i] [P, D] and
every bank image j with patches B[j] [Q, D]:

    mins[i, j, p] = min_q || Z[i, p] - B[j, q] ||      (utils.py:222-237)

The XLA formulation (tpu_ac.cluster.alpha) materializes a [P, N*P]
distance matrix per image — ~90 MB of HBM traffic each at MVTec scale.
This kernel keeps each [P, Q] tile in VMEM, accumulates the D-contraction
in a scratch accumulator, and writes only the [P]-vector of row-mins per
(i, j): HBM output shrinks by a factor of Q (784x).

Grid: (I/TI, J, K) — one fused launch for the whole image set (no host
loop over i), K (the D-tile axis) innermost so the accumulator carries
across k for a fixed (i-block, j) while Pallas double-buffers the next
bank block.  Each step keeps TI full [P, D] query rows resident in VMEM
(their block index only changes with the outer axis), so zi HBM traffic is
I*P*D bytes total and the dominant bank stream (N*Q*D bytes per i-block)
is amortized over TI queries.

Precision modes.  The MXU multiplies bf16, and a Mosaic-lowered dot
computes SINGLE-PASS bf16 products regardless of the ``precision=``
request (measured on v5e: passing f32 operands with either DEFAULT or
HIGHEST gives identical ~2e-2 absolute distance error vs an f64 oracle at
the flagship magnitudes, where true f32 products give ~1e-5).  f32-class
accuracy therefore comes from the explicit compensated decomposition:

- "f32" / "bf16c" (same computation): operands split z = hi + lo into two
           bf16 halves (~f32 mantissa coverage); the kernel accumulates
           hi.hi' + hi.lo' + lo.hi' — recovering the f32 product to
           ~2^-16 relative (the dropped lo.lo' term) — while the norm
           terms |z|^2 are computed in f32 outside.  Validated at ~1e-5
           absolute vs an f64 oracle, i.e. true-f32-class.  3 single-pass
           matmuls, same operand bytes as f32.  Parity mode.
- "bf16":  single-pass bf16 of the *rounded* vectors with norms computed
           from the same rounded values, so d2 = |hi_p - hi_q|^2 exactly
           (>= 0, no cancellation garbage).  Fastest; distances carry the
           bf16 rounding of the inputs (~2^-9 relative per coordinate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PRECISIONS = ("f32", "bf16c", "bf16")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _min_dists_kernel(*refs, n_k: int, d_tile: int, q_valid: int,
                      p_valid: int, compensated: bool, ti: int,
                      symmetric: bool, window: int | None):
    dual = symmetric or window is not None
    if compensated:
        (zi_hi_ref, zi_lo_ref, bank_hi_ref, bank_lo_ref,
         a2_ref, b2_ref) = refs[:6]
        rest = refs[6:]
    else:
        zi_hi_ref, bank_hi_ref, a2_ref, b2_ref = refs[:4]
        rest = refs[4:]
        zi_lo_ref = bank_lo_ref = None
    if dual:
        out_ref, out_col_ref, acc = rest
    else:
        (out_ref, acc), out_col_ref = rest, None
    i_blk = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    def active(t):
        # symmetric: upper triangle (gi <= j).  window (the triangle-SHARDED
        # sweep): additionally j < gi + window — the circulant column w of
        # query row r covers pair distance k = w - r + 1 in [1, window]
        gi = i_blk * ti + t
        if window is None:
            return gi <= j
        return (gi <= j) & (j < gi + window)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # bank blocks arrive pre-transposed as [d_tile, Q] so both operands
    # sit in the MXU-native orientation (lhs [M, K] x rhs [K, N]).  NOTE:
    # inside Mosaic a dot computes single-pass bf16 products regardless of
    # the `precision=` request (measured on v5e: identical 2e-2 absolute
    # distance error with DEFAULT and HIGHEST vs an f64 oracle, where true
    # f32 products give ~1e-5) — f32-accurate modes therefore use the
    # explicit hi/lo compensated decomposition below, never `precision`.
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # zi rows are VMEM-resident across the whole (j, k) sweep (their block
    # index only changes with the outer i-block), so the D contraction
    # slices the resident rows instead of re-streaming them from HBM.
    ks = pl.dslice(k * d_tile, d_tile)
    for t in range(ti):  # static unroll over the query block
        def _accumulate(t=t):
            acc[t] += dot(zi_hi_ref[t, :, ks], bank_hi_ref[0])
            if compensated:
                acc[t] += dot(zi_hi_ref[t, :, ks], bank_lo_ref[0])
                acc[t] += dot(zi_lo_ref[t, :, ks], bank_hi_ref[0])
        if dual:
            # the (j, i) tile is the transpose of the (i, j) tile when the
            # bank IS the query set, so only the active tiles (upper
            # triangle, further bounded by ``window`` in the sharded sweep)
            # compute; each tile emits BOTH mins[gi, j] (row-min) and
            # mins[j, gi] (col-min) — half the MXU work of the all-pairs
            # sweep.  Skipped steps also re-fetch no bank block (their
            # index map pins them to the nearest active j).
            pl.when(active(t))(_accumulate)
        else:
            _accumulate()

    @pl.when(k == n_k - 1)
    def _():
        b2 = b2_ref[0, 0]  # [Q_pad]
        for t in range(ti):
            def _finalize(t=t):
                a2 = a2_ref[t, 0]  # [P_pad]
                d2 = a2[:, None] - 2.0 * acc[t] + b2[None, :]
                d2q = d2
                if acc.shape[2] != q_valid:  # mask padded bank patches
                    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                    d2q = jnp.where(col < q_valid, d2, jnp.inf)
                out_ref[t, 0, 0] = jnp.sqrt(
                    jnp.maximum(jnp.min(d2q, axis=1), 0.0))
                if dual:  # mins[j, gi, q] = col-min of the same tile
                    d2p = d2
                    if acc.shape[1] != p_valid:  # mask padded query patches
                        row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
                        d2p = jnp.where(row < p_valid, d2, jnp.inf)
                    out_col_ref[0, t, 0] = jnp.sqrt(
                        jnp.maximum(jnp.min(d2p, axis=0), 0.0))
            if dual:
                pl.when(active(t))(_finalize)
            else:
                _finalize()


@functools.partial(
    jax.jit, static_argnames=("d_tile", "q_valid", "p_valid", "compensated",
                              "ti", "symmetric", "window", "interpret"))
def _min_dists_padded(zi_parts, bank_parts, a2, b2, *, d_tile: int,
                      q_valid: int, p_valid: int, compensated: bool, ti: int,
                      symmetric: bool, window: int | None, interpret: bool):
    n_i, p_pad, d_pad = zi_parts[0].shape
    n_j, _, q_pad = bank_parts[0].shape  # bank pre-transposed to [N, D, Q]
    n_k = d_pad // d_tile
    dual = symmetric or window is not None
    kernel = functools.partial(_min_dists_kernel, n_k=n_k, d_tile=d_tile,
                               q_valid=q_valid, p_valid=p_valid,
                               compensated=compensated, ti=ti,
                               symmetric=symmetric, window=window)

    def zi_spec():
        # full [TI, P, D] rows resident per i-block: fetched once per
        # outer step, NOT per (j, k) — cuts zi HBM traffic by N_j * n_k
        return pl.BlockSpec((ti, p_pad, d_pad), lambda i, j, k: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def bank_idx(i, j, k):
        # symmetric/window: steps outside the active band never compute, so
        # pin their bank block to the nearest active j (slice k=0) — Pallas
        # skips the fetch when the block index repeats, so a run of skipped
        # steps costs ONE block fetch instead of a full bank image each,
        # halving the bank HBM stream of the sweep
        if window is not None:
            lo = jnp.minimum(i * ti, n_j - 1)
            hi = jnp.minimum(i * ti + ti - 1 + window - 1, n_j - 1)
            jj = jnp.clip(j, lo, hi)
            return (jj, jnp.where(jj == j, k, 0), 0)
        if not symmetric:
            return (j, k, 0)
        skip = j < i * ti
        jj = jnp.where(skip, jnp.minimum(i * ti, n_j - 1), j)
        return (jj, jnp.where(skip, 0, k), 0)

    def bank_spec():
        # [N, D_pad, Q_pad] layout: the k-th [d_tile, Q] slice per step
        return pl.BlockSpec((1, d_tile, q_pad), bank_idx,
                            memory_space=pltpu.VMEM)

    # norm vectors carry a singleton middle axis so each block's trailing
    # two dims equal the array dims (Mosaic requires the last two block
    # dims divisible by (8, 128) or equal to the array dims)
    in_specs = [zi_spec() for _ in zi_parts] + [bank_spec() for _ in bank_parts]
    in_specs += [
        pl.BlockSpec((ti, 1, p_pad), lambda i, j, k: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, q_pad), lambda i, j, k: (bank_idx(i, j, k)[0],
                                                     0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # the output block likewise needs trailing two dims equal to array
    # dims, hence the singleton third axis squeezed off on return
    out_shape = jax.ShapeDtypeStruct((n_i, n_j, 1, p_pad), jnp.float32)
    out_spec = pl.BlockSpec((ti, 1, 1, p_pad), lambda i, j, k: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    if dual:
        # second output: mins[j, gi, q] col-mins (valid where first index
        # is > second; the caller combines the two triangles)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_j, n_i, 1, q_pad), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((1, ti, 1, q_pad),
                                 lambda i, j, k: (j, i, 0, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_i // ti, n_j, n_k),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((ti, p_pad, q_pad), jnp.float32)],
        # the resident query blocks exceed XLA's stock 16 MiB scoped-vmem
        # ceiling; raise it per-kernel (v5e VMEM is 128 MiB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(*zi_parts, *bank_parts, a2, b2)
    if not dual:
        return out[:, :, 0]
    if window is not None:
        # triangle-sharded sweep: return both raw outputs (inactive tiles
        # are UNDEFINED — the mesh caller masks by the pair predicate)
        return out[0][:, :, 0], out[1][:, :, 0]
    row, col = out[0][:, :, 0], out[1][:, :, 0]  # [I,J,P_pad], [J,I,Q_pad]
    # mins[a, b] came from the (a, b) tile's row-min when a <= b and from
    # the (b, a) tile's col-min when a > b; stitch the triangles (same
    # products in the same contraction order — only the a2/b2 rank-1 adds
    # swap, a ~1 ulp f32 effect)
    # col[a, b] is indexed [bank image a, query image b]: pad a up to the
    # ti-padded query count and drop the padded-query columns b >= n_j
    col = jnp.pad(col, ((0, n_i - n_j), (0, 0), (0, 0)))[:, :n_j, :p_pad]
    upper = (jnp.arange(n_i)[:, None] <= jnp.arange(n_j)[None, :])
    return jnp.where(upper[:, :, None], row, col)


def _split_hi_lo(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prep_operands(Z: jnp.ndarray, bank: jnp.ndarray, *, d_tile: int,
                   precision: str, ti: int):
    """Pad + precision-split + pre-transpose the kernel operands.

    Returns (zi_parts, bank_parts, a2, b2) with Z padded to
    ([I_pad(ti), P_pad(16), D_pad(d_tile)]) and bank pre-transposed to
    [N, D_pad, Q_pad(128)] — P is the query-row (sublane) axis of every
    block it appears in, so it only needs 16-alignment (bf16 sublane tile),
    NOT 128; Q stays 128-aligned (the lane axis of the [P, Q] distance tile
    and of the min reduction).
    """
    n_i, p, d = Z.shape
    q = bank.shape[1]
    p_pad = _round_up(p, 16)
    q_pad = _round_up(q, 128)
    d_pad = _round_up(d, d_tile)
    i_pad = _round_up(n_i, ti)

    z_p = jnp.pad(Z.astype(jnp.float32),
                  ((0, i_pad - n_i), (0, p_pad - p), (0, d_pad - d)))
    bank_p = jnp.pad(bank.astype(jnp.float32),
                     ((0, 0), (0, q_pad - q), (0, d_pad - d)))

    # bank operands transpose ONCE here to [N, D, Q] (a cheap one-shot XLA
    # relayout) so the kernel's per-step dot needs no Mosaic transpose.
    if precision in ("f32", "bf16c"):
        zi_parts = _split_hi_lo(z_p)
        bank_parts = tuple(jnp.swapaxes(x, 1, 2)
                           for x in _split_hi_lo(bank_p))
        a2 = jnp.sum(jnp.square(z_p), axis=-1)[:, None, :]
        b2 = jnp.sum(jnp.square(bank_p), axis=-1)[:, None, :]
    else:  # "bf16": norms from the rounded values keep d2 >= 0 exactly
        z_hi = z_p.astype(jnp.bfloat16)
        bank_hi = bank_p.astype(jnp.bfloat16)
        zi_parts, bank_parts = (z_hi,), (jnp.swapaxes(bank_hi, 1, 2),)
        a2 = jnp.sum(jnp.square(z_hi.astype(jnp.float32)),
                     axis=-1)[:, None, :]
        b2 = jnp.sum(jnp.square(bank_hi.astype(jnp.float32)),
                     axis=-1)[:, None, :]
    return zi_parts, bank_parts, a2, b2


def min_dists_all_pairs(Z: jnp.ndarray, bank: jnp.ndarray,
                        *, d_tile: int = 1024, precision: str = "f32",
                        ti: int | None = None, symmetric: bool = False,
                        interpret: bool | None = None) -> jnp.ndarray:
    """mins[i, j, p] = min_q ||Z[i, p] - bank[j, q]|| in one fused launch.

    Args:
        Z: [I, P, D] query patch sets.
        bank: [N, Q, D] bank patch sets (for the unsupervised alpha this is
            Z itself; for supervised it is the train set).
        precision: "f32" | "bf16c" | "bf16" (see module docstring).
        d_tile: D-contraction tile.  1024 measured best at the flagship
            shape (v5e sweep over 512/1024/2048: 72.4/70.8 ms f32,
            69.7/70.5 ms bf16 for 1024/2048 vs 73.6/70.3 at 512).
        ti: query rows processed per grid step.  Each step holds ti full
            [P, D] query rows resident in VMEM, so the bank HBM stream
            (the dominant traffic, N_j * D * Q bytes per query) is shared
            by ti queries.  None = 2 (ti swept over {1, 2, 4} on v5e at
            the flagship shape: all within measurement noise, 2 kept).
        symmetric: the caller asserts ``bank`` IS ``Z`` (the unsupervised
            alpha).  The (j, i) distance tile is then the transpose of the
            (i, j) tile, so the kernel computes only the upper triangle and
            emits each tile's row-mins AND col-mins — ~2x less MXU work
            and ~2x less bank HBM traffic for the all-pairs sweep.
    Returns:
        [I, N, P] float32 min-distances.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision not in PRECISIONS:
        raise ValueError(f"precision {precision!r}; want one of {PRECISIONS}")
    if symmetric and Z.shape != bank.shape:
        raise ValueError(f"symmetric=True needs bank is Z; got Z {Z.shape} "
                         f"vs bank {bank.shape}")
    if ti is None:
        ti = 2  # measured best at the flagship shape for all precisions
    n_i, p, _ = Z.shape
    q = bank.shape[1]
    ti = max(1, min(ti, n_i))
    parts = _prep_operands(Z, bank, d_tile=d_tile, precision=precision,
                           ti=ti)
    out = _min_dists_padded(*parts, d_tile=d_tile,
                            q_valid=q, p_valid=p,
                            compensated=(precision != "bf16"),
                            ti=ti, symmetric=symmetric, window=None,
                            interpret=interpret)
    return out[:n_i, :, :p]


def min_dists_window(Z: jnp.ndarray, bank_window: jnp.ndarray, *,
                     window: int, d_tile: int = 1024, precision: str = "f32",
                     ti: int | None = None,
                     interpret: bool | None = None
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Circulant-window sweep for the TRIANGLE-SHARDED unsupervised alpha.

    The caller owns globally-contiguous query rows a = offset + r and a
    window of the (symmetric) bank whose column w holds global image
    b = (offset + 1 + w) mod N.  Tile (r, w) computes iff
    ``r <= w < r + window`` — i.e. pair distance k = w - r + 1 in
    [1, window] — and emits BOTH mins[a, b] (row-min) and mins[b, a]
    (col-min), so a dp-mesh device does N^2/(2 dp) tile sweeps instead of
    the rectangular N^2/dp (see
    ``tpu_ac.distributed.sharded_weight_distance_unsupervised``).

    Returns ``(row_mins [I, W, P], col_mins [W, I, Q])`` f32.  Entries of
    inactive tiles are UNDEFINED — the caller must mask by the pair
    predicate before reducing.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision not in PRECISIONS:
        raise ValueError(f"precision {precision!r}; want one of {PRECISIONS}")
    if not 1 <= window:
        raise ValueError(f"window must be >= 1, got {window}")
    n_i, p, _ = Z.shape
    q = bank_window.shape[1]
    if ti is None:
        ti = 2
    ti = max(1, min(ti, n_i))
    parts = _prep_operands(Z, bank_window, d_tile=d_tile,
                           precision=precision, ti=ti)
    row, col = _min_dists_padded(*parts, d_tile=d_tile,
                                 q_valid=q, p_valid=p,
                                 compensated=(precision != "bf16"),
                                 ti=ti, symmetric=False, window=window,
                                 interpret=interpret)
    return row[:n_i, :, :p], col[:, :n_i, :q]


def min_dists_to_sets(zi: jnp.ndarray, bank: jnp.ndarray,
                      *, d_tile: int = 512, precision: str = "f32",
                      interpret: bool | None = None) -> jnp.ndarray:
    """mins[j, p] = min_q ||zi[p] - bank[j, q]|| for one query set zi [P, D].

    Returns [N, P] float32.  Kept for callers that stream one query image at
    a time; the alpha path uses the fused ``min_dists_all_pairs``.
    """
    return min_dists_all_pairs(zi[None], bank, d_tile=d_tile,
                               precision=precision, interpret=interpret)[0]
