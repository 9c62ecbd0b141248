"""Approximate nearest-neighbour search — the ApproximateFaissNN equivalent.

The reference wraps FAISS IndexIVFPQ (models/patchcore/common.py:100-117):
a coarse inverted file limits each query to a few cells of the bank.  The
TPU-native equivalent is IVF-Flat: k-means coarse centroids (Lloyd
iterations as one jitted fori_loop), cells padded to a fixed size so the
whole index is three static arrays, and search = centroid top-nprobe ->
gather candidate cells -> exact masked distances -> top-k.  All stages are
MXU matmuls + top_k; no host round-trips.

Accuracy/speed trade-off mirrors IVFPQ's: exact within probed cells,
recall governed by nprobe/nlist.

``IVFPQIndex`` adds the reference's product-quantization semantics
(``faiss.IndexIVFPQ(IndexFlatL2(d), d, 512 centroids, 64 sub-quantizers,
8 bits)``, common.py:109-117): residuals to the coarse centroid are
quantized in M sub-spaces with 2^nbits codes each, so stored vectors cost
M bytes instead of 4*D.  Search uses the asymmetric-distance (ADC)
decomposition ``||q - (c + r)||^2 = ||q - c||^2 + (||r||^2 + 2 c.r)
- 2 q.r``: the middle term is a per-stored-vector scalar precomputed at
fit time, and the last is a per-query [M, 2^nbits] dot-product LUT
gathered by code — one matmul + one flat gather per query batch, never a
D-dim candidate tensor in HBM.
"""

from __future__ import annotations

import functools
import os

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
                 kmeans_iters: int = 10, seed: int = 0,
                 query_chunk: int = 1024):
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.kmeans_iters = kmeans_iters
        self.seed = seed
        self.query_chunk = query_chunk
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
        q = np.asarray(query, np.float32)
        n_probe = min(self.n_probe, self.centroids.shape[0])
        max_cell = self.cells.shape[1]
        k = min(k, n_probe * max_cell)
        # chunked queries: the [chunk, nprobe*max_cell, D] candidate
        # gather is the live-memory peak; a whole PatchCore predict's
        # B*P queries at once would blow HBM on skewed cells
        outs = [_ivfflat_search(jnp.asarray(q[i:i + self.query_chunk]),
                                self.centroids, self.cells,
                                self.cell_ids, self.cell_valid,
                                n_probe=n_probe, k=k)
                for i in range(0, len(q), self.query_chunk)]
        d2 = np.concatenate([np.asarray(o[0]) for o in outs])
        idx = np.concatenate([np.asarray(o[1]) for o in outs])
        return d2, idx


# Index arrays travel as jit ARGUMENTS (never closure captures): a fresh
# closure per call would retrace + recompile every search and inline the
# whole index into the HLO (CLAUDE.md: minutes per remote compile).
@functools.partial(jax.jit, static_argnames=("n_probe", "k"))
def _ivfflat_search(q, centroids, cells, cell_ids, cell_valid,
                    *, n_probe: int, k: int):
    cd2 = pairwise_sq_dists(q, centroids)           # [M, nlist]
    _, probe = jax.lax.top_k(-cd2, n_probe)          # [M, nprobe]
    cand = cells[probe]                # [M, nprobe, max_cell, D]
    cand_ids = cell_ids[probe]         # [M, nprobe, max_cell]
    cand_valid = cell_valid[probe]
    m = q.shape[0]
    cand = cand.reshape(m, -1, cand.shape[-1])
    d2 = jnp.sum(jnp.square(cand - q[:, None, :]), axis=-1)
    d2 = jnp.where(cand_valid.reshape(m, -1), d2, jnp.inf)
    neg, pos = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cand_ids.reshape(m, -1), pos, axis=1)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("n_probe", "k"))
def _ivfpq_search(q, centroids, codebooks, cell_codes, cell_const,
                  cell_ids, cell_valid, *, n_probe: int, k: int):
    b = q.shape[0]
    m, k_codes, dsub = codebooks.shape
    cd2 = pairwise_sq_dists(q, centroids)            # [B, L]
    neg_cd2, probe = jax.lax.top_k(-cd2, n_probe)    # [B, P]
    # per-query LUT: q_sub . codebook  -> [B, M, K]
    q_sub = q.reshape(b, m, dsub)
    qdot = jnp.einsum("bmd,mkd->bmk", q_sub, codebooks,
                      precision=jax.lax.Precision.HIGHEST)
    qdot_flat = qdot.reshape(b, m * k_codes)
    cand_codes = cell_codes[probe].astype(jnp.int32)
    flat_idx = cand_codes + (jnp.arange(m, dtype=jnp.int32)
                             * k_codes)              # [B, P, C, M]
    qr = jnp.take_along_axis(qdot_flat[:, None, None, :], flat_idx, axis=3)
    qr = jnp.sum(qr, axis=-1)                        # [B, P, C]
    d2 = (-neg_cd2)[:, :, None] + cell_const[probe] - 2.0 * qr
    d2 = jnp.where(cell_valid[probe], d2, jnp.inf)
    d2 = d2.reshape(b, -1)
    neg, pos = jax.lax.top_k(-d2, k)
    idx = jnp.take_along_axis(cell_ids[probe].reshape(b, -1), pos, axis=1)
    return -neg, idx


def _kmeans_batched(xs: jnp.ndarray, n_clusters: int, n_iters: int,
                    seed: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means over a batch of independent problems.

    xs: [M, N, d] -> (centroids [M, n_clusters, d], assignments [M, N]).
    One jitted program; the M sub-problems run as a vmapped batch.
    """
    _, n, _ = xs.shape
    init = np.random.default_rng(seed).choice(n, n_clusters, replace=False)
    cents0 = xs[:, jnp.asarray(init)]

    @jax.jit
    def run(xs, cents):
        def one(x, cents):
            def body(_, cents):
                d2 = pairwise_sq_dists(x, cents)
                assign = jnp.argmin(d2, axis=1)
                onehot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
                sums = onehot.T @ x
                counts = jnp.sum(onehot, axis=0)[:, None]
                return jnp.where(counts > 0,
                                 sums / jnp.maximum(counts, 1.0), cents)

            cents = jax.lax.fori_loop(0, n_iters, body, cents)
            return cents, jnp.argmin(pairwise_sq_dists(x, cents), axis=1)

        return jax.vmap(one)(xs, cents)

    return run(xs, cents0)


class IVFPQIndex:
    """Inverted file + product quantization (the ApproximateFaissNN
    semantics, common.py:100-126): M-byte codes per stored vector, ADC
    search.  Defaults mirror the reference's IndexIVFPQ(512, 64, 8)."""

    def __init__(self, n_lists: int = 512, n_probe: int = 8,
                 code_size: int = 64, n_bits: int = 8,
                 kmeans_iters: int = 10, seed: int = 0,
                 query_chunk: int = 1024):
        if n_bits > 8:
            raise ValueError("codes are stored as uint8; n_bits <= 8")
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.code_size = code_size
        self.n_bits = n_bits
        self.kmeans_iters = kmeans_iters
        self.seed = seed
        self.query_chunk = query_chunk
        self.centroids: jnp.ndarray | None = None  # [L, D]
        self.codebooks: jnp.ndarray | None = None  # [M, K, dsub]
        self.cell_codes: jnp.ndarray | None = None  # [L, max_cell, M] uint8
        self.cell_const: jnp.ndarray | None = None  # [L, max_cell] f32
        self.cell_ids: jnp.ndarray | None = None    # [L, max_cell] int32
        self.cell_valid: jnp.ndarray | None = None  # [L, max_cell] bool
        self._pad = 0

    def _padded(self, x: np.ndarray) -> np.ndarray:
        if self._pad:
            x = np.pad(x, ((0, 0), (0, self._pad)))
        return x

    def fit(self, bank: np.ndarray) -> None:
        bank = np.asarray(bank, np.float32)
        n, d = bank.shape
        m = min(self.code_size, d)
        self._pad = (-d) % m
        bank = self._padded(bank)
        d_pad = d + self._pad
        dsub = d_pad // m

        n_lists = min(self.n_lists, n)
        cents, assign = kmeans(jnp.asarray(bank), n_lists,
                               self.kmeans_iters, self.seed)
        cents = np.asarray(cents)
        assign = np.asarray(assign)

        residual = bank - cents[assign]
        k_codes = min(2 ** self.n_bits, n)
        xs = jnp.asarray(residual.reshape(n, m, dsub).transpose(1, 0, 2))
        codebooks, codes = _kmeans_batched(xs, k_codes, self.kmeans_iters,
                                           self.seed + 1)
        codebooks = np.asarray(codebooks)          # [M, K, dsub]
        codes = np.asarray(codes).T.astype(np.uint8)  # [N, M]

        # per-stored-vector ADC constant: ||r_code||^2 + 2 c . r_code
        decoded = codebooks[np.arange(m)[None, :], codes]  # [N, M, dsub]
        decoded = decoded.reshape(n, d_pad)
        const = (np.sum(decoded * decoded, axis=1)
                 + 2.0 * np.sum(cents[assign] * decoded, axis=1))

        max_cell = max(1, int(np.bincount(assign, minlength=n_lists).max()))
        cell_codes = np.zeros((n_lists, max_cell, m), np.uint8)
        cell_const = np.zeros((n_lists, max_cell), np.float32)
        ids = np.full((n_lists, max_cell), -1, np.int32)
        valid = np.zeros((n_lists, max_cell), bool)
        fill = np.zeros(n_lists, np.int64)
        for i, c in enumerate(assign):
            j = fill[c]
            cell_codes[c, j] = codes[i]
            cell_const[c, j] = const[i]
            ids[c, j] = i
            valid[c, j] = True
            fill[c] += 1
        self.centroids = jnp.asarray(cents)
        self.codebooks = jnp.asarray(codebooks)
        self.cell_codes = jnp.asarray(cell_codes)
        self.cell_const = jnp.asarray(cell_const)
        self.cell_ids = jnp.asarray(ids)
        self.cell_valid = jnp.asarray(valid)

    @property
    def code_bytes(self) -> int:
        """Bytes spent on stored-vector codes (the PQ compression claim)."""
        return int(self.cell_codes.size) if self.cell_codes is not None else 0

    def search(self, query: np.ndarray, k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        """(approx sq_distances [Q, k], bank indices [Q, k]) via ADC."""
        if self.centroids is None:
            raise ValueError("index is not fitted")
        query = self._padded(np.asarray(query, np.float32))
        n_probe = min(self.n_probe, self.centroids.shape[0])
        max_cell = self.cell_codes.shape[1]
        k = min(k, n_probe * max_cell)

        outs = [_ivfpq_search(jnp.asarray(query[i:i + self.query_chunk]),
                              self.centroids, self.codebooks,
                              self.cell_codes, self.cell_const,
                              self.cell_ids, self.cell_valid,
                              n_probe=n_probe, k=k)
                for i in range(0, len(query), self.query_chunk)]
        d2 = np.concatenate([np.asarray(o[0]) for o in outs])
        idx = np.concatenate([np.asarray(o[1]) for o in outs])
        return d2, idx


class ApproximateNearestNeighbourScorer:
    """Drop-in NearestNeighbourScorer variant over the IVF indexes
    (common.py ApproximateFaissNN + NearestNeighbourScorer composition).

    ``method="ivfpq"`` matches the reference's IndexIVFPQ memory semantics;
    ``method="ivfflat"`` keeps exact distances within probed cells."""

    def __init__(self, n_nearest_neighbours: int = 1,
                 n_lists: int | None = None,
                 n_probe: int = 8, method: str = "ivfflat",
                 code_size: int = 64, n_bits: int = 8):
        self.n_nearest_neighbours = n_nearest_neighbours
        if method == "ivfpq":
            # defaults mirror the reference's IndexIVFPQ(dim, 512, 64, 8)
            # (common.py:109-117): 512 coarse centroids, 64 sub-quantizers
            self.index: IVFFlatIndex | IVFPQIndex = IVFPQIndex(
                n_lists=512 if n_lists is None else n_lists,
                n_probe=n_probe, code_size=code_size, n_bits=n_bits)
        elif method == "ivfflat":
            self.index = IVFFlatIndex(
                n_lists=64 if n_lists is None else n_lists, n_probe=n_probe)
        else:
            raise ValueError(f"unknown approximate-NN method {method!r}")

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

    # -- persistence (the faiss.write_index equivalent, common.py:71-82):
    #    the fitted index is a handful of arrays. --
    _FLAT_KEYS = ("centroids", "cells", "cell_ids", "cell_valid")
    _PQ_KEYS = ("centroids", "codebooks", "cell_codes", "cell_const",
                "cell_ids", "cell_valid")

    @staticmethod
    def _index_file(folder: str, prepend: str = "") -> str:
        return os.path.join(folder, prepend + "nnscorer_ivf_index.npz")

    def save(self, save_folder: str, prepend: str = "") -> None:
        is_pq = isinstance(self.index, IVFPQIndex)
        keys = self._PQ_KEYS if is_pq else self._FLAT_KEYS
        arrays = {k: np.asarray(getattr(self.index, k)) for k in keys}
        if is_pq:
            arrays["pad"] = np.int64(self.index._pad)
        np.savez_compressed(
            self._index_file(save_folder, prepend),
            method="ivfpq" if is_pq else "ivfflat",
            k=self.n_nearest_neighbours, n_probe=self.index.n_probe,
            **arrays)

    def load(self, load_folder: str, prepend: str = "") -> None:
        data = np.load(self._index_file(load_folder, prepend))
        method = str(data["method"])
        self.n_nearest_neighbours = int(data["k"])
        if method == "ivfpq":
            self.index = IVFPQIndex(n_probe=int(data["n_probe"]))
            self.index._pad = int(data["pad"])
            keys = self._PQ_KEYS
        else:
            self.index = IVFFlatIndex(n_probe=int(data["n_probe"]))
            keys = self._FLAT_KEYS
        for key in keys:
            setattr(self.index, key, jnp.asarray(data[key]))
