"""Approximate nearest-neighbour search — the ApproximateFaissNN equivalent.

The reference wraps FAISS IndexIVFPQ (models/patchcore/common.py:100-117):
a coarse inverted file limits each query to a few cells of the bank.  The
TPU-native equivalent is IVF-Flat: k-means coarse centroids (Lloyd
iterations as one jitted fori_loop), cells padded to a fixed size so the
whole index is three static arrays, and search = centroid top-nprobe ->
gather candidate cells -> exact masked distances -> top-k.  All stages are
MXU matmuls + top_k; no host round-trips.

Accuracy/speed trade-off mirrors IVFPQ's: exact within probed cells,
recall governed by nprobe/nlist (PQ's extra compression is skipped — HBM
is not the constraint at PatchCore bank sizes).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpu_ac.ops.distances import pairwise_sq_dists


def kmeans(x: jnp.ndarray, n_clusters: int, n_iters: int = 10,
           seed: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means on device: returns (centroids [k, D], assignments [N])."""
    n = x.shape[0]
    init = np.random.default_rng(seed).choice(n, n_clusters, replace=False)
    cents0 = x[jnp.asarray(init)]

    @jax.jit
    def run(x, cents):
        def body(_, cents):
            d2 = pairwise_sq_dists(x, cents)            # [N, k]
            assign = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
            sums = onehot.T @ x                          # [k, D]
            counts = jnp.sum(onehot, axis=0)[:, None]
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0),
                             cents)

        cents = jax.lax.fori_loop(0, n_iters, body, cents)
        assign = jnp.argmin(pairwise_sq_dists(x, cents), axis=1)
        return cents, assign

    return run(x, cents0)


class IVFFlatIndex:
    """Inverted-file flat index with static cell tables."""

    def __init__(self, n_lists: int = 64, n_probe: int = 8,
                 kmeans_iters: int = 10, seed: int = 0):
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.kmeans_iters = kmeans_iters
        self.seed = seed
        self.centroids: jnp.ndarray | None = None
        self.cells: jnp.ndarray | None = None       # [nlist, max_cell, D]
        self.cell_ids: jnp.ndarray | None = None    # [nlist, max_cell]
        self.cell_valid: jnp.ndarray | None = None  # [nlist, max_cell] bool

    def fit(self, bank: np.ndarray) -> None:
        bank = np.asarray(bank, np.float32)
        n, d = bank.shape
        n_lists = min(self.n_lists, n)
        cents, assign = kmeans(jnp.asarray(bank), n_lists,
                               self.kmeans_iters, self.seed)
        assign = np.asarray(assign)
        max_cell = max(1, int(np.bincount(assign, minlength=n_lists).max()))
        cells = np.zeros((n_lists, max_cell, d), np.float32)
        ids = np.full((n_lists, max_cell), -1, np.int32)
        valid = np.zeros((n_lists, max_cell), bool)
        fill = np.zeros(n_lists, np.int64)
        for i, c in enumerate(assign):
            j = fill[c]
            cells[c, j] = bank[i]
            ids[c, j] = i
            valid[c, j] = True
            fill[c] += 1
        self.centroids = jnp.asarray(np.asarray(cents))
        self.cells = jnp.asarray(cells)
        self.cell_ids = jnp.asarray(ids)
        self.cell_valid = jnp.asarray(valid)

    def search(self, query: np.ndarray, k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """(sq_distances [M, k], bank indices [M, k]) over probed cells."""
        if self.centroids is None:
            raise ValueError("index is not fitted")
        q = jnp.asarray(np.asarray(query, np.float32))
        n_probe = min(self.n_probe, self.centroids.shape[0])
        max_cell = self.cells.shape[1]
        k = min(k, n_probe * max_cell)

        @jax.jit
        def run(q):
            cd2 = pairwise_sq_dists(q, self.centroids)      # [M, nlist]
            _, probe = jax.lax.top_k(-cd2, n_probe)          # [M, nprobe]
            cand = self.cells[probe]          # [M, nprobe, max_cell, D]
            cand_ids = self.cell_ids[probe]   # [M, nprobe, max_cell]
            cand_valid = self.cell_valid[probe]
            m = q.shape[0]
            cand = cand.reshape(m, -1, cand.shape[-1])
            d2 = jnp.sum(jnp.square(cand - q[:, None, :]), axis=-1)
            d2 = jnp.where(cand_valid.reshape(m, -1), d2, jnp.inf)
            neg, pos = jax.lax.top_k(-d2, k)
            idx = jnp.take_along_axis(cand_ids.reshape(m, -1), pos, axis=1)
            return -neg, idx

        d2, idx = run(q)
        return np.asarray(d2), np.asarray(idx)


class ApproximateNearestNeighbourScorer:
    """Drop-in NearestNeighbourScorer variant over the IVF index
    (common.py ApproximateFaissNN + NearestNeighbourScorer composition)."""

    def __init__(self, n_nearest_neighbours: int = 1, n_lists: int = 64,
                 n_probe: int = 8):
        self.n_nearest_neighbours = n_nearest_neighbours
        self.index = IVFFlatIndex(n_lists=n_lists, n_probe=n_probe)

    def fit(self, detection_features: list[np.ndarray]) -> None:
        bank = np.concatenate(
            [np.asarray(f).reshape(len(f), -1) for f in detection_features],
            axis=1)
        self.index.fit(bank)

    def predict(self, query_features: list[np.ndarray]):
        q = np.concatenate(
            [np.asarray(f).reshape(len(f), -1) for f in query_features],
            axis=1)
        d2, idx = self.index.search(q, self.n_nearest_neighbours)
        return np.mean(d2, axis=-1), d2, idx
