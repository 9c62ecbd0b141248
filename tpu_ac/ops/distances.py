"""Pairwise Euclidean distances and exact k-NN — the FAISS replacement.

The reference leans on two native components for distance work:

- ``torch.cdist`` inside the alpha-weight math
  (Anomaly-Clustering/models/patchcore/utils.py:222-237),
- FAISS ``IndexFlatL2`` for the PatchCore scorer
  (Anomaly-Clustering/models/patchcore/common.py:14-117).

On TPU both reduce to the same primitive: a tiled
``|a|^2 - 2ab + |b|^2`` matmul on the MXU followed by a row reduction
(min / top-k).  f32 with HIGHEST precision is used so the cancellation in
``-2ab + |a|^2 + |b|^2`` matches torch's mm-based cdist path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray,
                      precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Squared L2 distances between rows: [..., M, D] x [..., N, D] -> [..., M, N]."""
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=-1, keepdims=True)
    ab = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((a.ndim - 1,), (b.ndim - 1,)),
                           (tuple(range(a.ndim - 2)), tuple(range(b.ndim - 2)))),
        precision=precision,
    )
    d2 = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """torch.cdist(p=2) via the matmul path (clamped sqrt of sq-dists)."""
    return jnp.sqrt(pairwise_sq_dists(a, b))


def knn(query: jnp.ndarray, index: jnp.ndarray, k: int,
        *, tile: int = 4096) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k nearest neighbours by L2 distance (FAISS IndexFlatL2.search).

    Args:
        query: [M, D] query vectors.
        index: [N, D] database vectors.
        k: number of neighbours.
        tile: query rows processed per step (bounds the [tile, N] live
            distance matrix so HBM stays flat for large M).
    Returns:
        (sq_distances [M, k], indices [M, k]) — FAISS returns *squared* L2
        distances, which the reference consumes directly.
    """
    m = query.shape[0]
    if m <= tile:
        d2 = pairwise_sq_dists(query, index)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    pad = (-m) % tile
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, tile, query.shape[1])

    def step(_, qt):
        d2 = pairwise_sq_dists(qt, index)
        neg, idx = jax.lax.top_k(-d2, k)
        return None, (-neg, idx)

    _, (dists, idxs) = jax.lax.scan(step, None, q)
    return dists.reshape(-1, k)[:m], idxs.reshape(-1, k)[:m]


def knn_ip(query: jnp.ndarray, index: jnp.ndarray, k: int,
           *, tile: int = 4096) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN by inner product (FAISS IndexFlatIP.search) — used by
    SCAN's neighbor mining (Unsupervised-Classification-master/utils/
    memory.py:46-65) on (normalized) memory-bank features.

    Query rows are tiled like :func:`knn` so the live [tile, N] similarity
    matrix bounds HBM — SCAN mines with the whole bank as queries, where an
    untiled [N, N] f32 matrix would be ~10 GB at N=50k.

    Returns (similarities [M, k], indices [M, k]), descending.
    """
    def sims_of(q):
        return jax.lax.dot_general(
            q, index,
            dimension_numbers=(((q.ndim - 1,), (index.ndim - 1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    m = query.shape[0]
    if m <= tile:
        return jax.lax.top_k(sims_of(query), k)

    pad = (-m) % tile
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, tile, query.shape[1])

    def step(_, qt):
        return None, jax.lax.top_k(sims_of(qt), k)

    _, (sims, idxs) = jax.lax.scan(step, None, q)
    return sims.reshape(-1, k)[:m], idxs.reshape(-1, k)[:m]


def _sharded_topk(query, bank_padded, k, mesh, axis_name, tile,
                  score_rows, largest: bool, n_valid: int, shard_rows: int):
    """Shared scaffolding for the bank-sharded exact searches: local
    top-k per shard (padded rows masked out BEFORE the top-k — a
    zero-padded row can otherwise beat real neighbours and silently
    evict them from a shard's candidates), then one all_gather of
    [M, k] winners per device and a final top-k over dp*k."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    sign = 1.0 if largest else -1.0
    mask_val = -jnp.inf  # in sign-flipped space

    def local(q, bank_shard):
        shard = jax.lax.axis_index(axis_name)
        valid = (shard * shard_rows + jnp.arange(shard_rows)) < n_valid

        def search(qt):
            s = sign * score_rows(qt, bank_shard)
            return jax.lax.top_k(jnp.where(valid[None, :], s, mask_val), k)

        m = q.shape[0]
        if m <= tile:
            s, idx = search(q)
        else:
            qp = jnp.pad(q, ((0, (-m) % tile), (0, 0)))
            _, (ss, idxs) = jax.lax.scan(
                lambda _, qt: (None, search(qt)), None,
                qp.reshape(-1, tile, q.shape[1]))
            s, idx = ss.reshape(-1, k)[:m], idxs.reshape(-1, k)[:m]
        gidx = idx + shard * shard_rows
        all_s = jax.lax.all_gather(s, axis_name, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis_name, axis=1, tiled=True)
        best, pos = jax.lax.top_k(all_s, k)
        return sign * best, jnp.take_along_axis(all_idx, pos, axis=1)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(axis_name)),
                   out_specs=(P(), P()), check_rep=False)
    return fn(query, bank_padded)


def knn_ip_sharded(query: jnp.ndarray, index: jnp.ndarray, k: int, mesh,
                   *, axis_name: str = "dp", tile: int = 4096
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact inner-product k-NN with the index row-sharded over a mesh.

    The TPU-native equivalent of SCAN's ``faiss.index_cpu_to_all_gpus``
    sharded IndexFlatIP (Unsupervised-Classification-master/utils/
    memory.py:46-65) — the reference's ONLY multi-GPU faiss use.  Same
    merge scheme as :func:`knn_sharded`, with max-similarity semantics.

    Returns (similarities [M, k], indices [M, k]), descending, indices
    into the unsharded ``index``.
    """
    dp = mesh.shape[axis_name]
    n = index.shape[0]
    shard_rows = -(-n // dp)
    if dp == 1 or shard_rows < k:
        return knn_ip(query, index, k, tile=tile)
    bank = jnp.pad(index, ((0, shard_rows * dp - n), (0, 0)))

    def sims(qt, bank_shard):
        return jax.lax.dot_general(
            qt, bank_shard, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    return _sharded_topk(query, bank, k, mesh, axis_name, tile,
                         sims, True, n, shard_rows)


def knn_sharded(query: jnp.ndarray, index: jnp.ndarray, k: int, mesh,
                *, axis_name: str = "dp", tile: int = 4096
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN by L2 with the index (memory bank) row-sharded over a
    mesh.

    TPU-native replacement for FAISS's multi-GPU index sharding
    (``faiss.index_cpu_to_all_gpus``): each device holds N/dp bank rows
    and computes its local exact top-k (queries replicated — they are
    tiny next to the bank); the per-device winners are merged by ONE
    all_gather of [M, k] candidates per device and a final top-k over
    dp*k, so ICI traffic is independent of the bank size.  Exact: each
    of the k global nearest rows is some shard's local top-k member.

    Falls back to the single-device :func:`knn` when the bank is too
    small to shard usefully (fewer than k rows per device).

    Returns (sq_distances [M, k], indices [M, k]) like :func:`knn`;
    indices refer to rows of the UNsharded ``index``.
    """
    dp = mesh.shape[axis_name]
    n = index.shape[0]
    shard_rows = -(-n // dp)
    if dp == 1 or shard_rows < k:
        return knn(query, index, k, tile=tile)
    bank = jnp.pad(index, ((0, shard_rows * dp - n), (0, 0)))
    return _sharded_topk(query, bank, k, mesh, axis_name, tile,
                         pairwise_sq_dists, False, n, shard_rows)
