"""Adaptive average pooling and neighborhood patchification.

TPU-first design notes
----------------------
``adaptive_avg_pool1d`` in the reference collapses each patch's
(layers x C x k x k) feature window down to a fixed dimension
(reference: Anomaly-Clustering/models/patchcore/common.py:163-183).  Torch's
adaptive pooling averages *exact integer bucket boundaries*
(start = floor(i*L/out), end = ceil((i+1)*L/out)), which a plain
``jax.image.resize`` does NOT reproduce.  We precompute the (static) bucket
index/weight tables once per (L, out) pair and evaluate the pool either as

- a windowed gather + weighted sum (exact order of adds, VPU-friendly), or
- a banded [L, out] matmul (MXU-friendly; used on TPU where a single big
  matmul beats gathers).

``patchify`` replicates torch.nn.Unfold(kernel, stride=s, padding=p)
(reference: Anomaly-Clustering/models/patchcore/patchcore.py:434-465) by
stacking statically-shifted slices of the zero-padded input — no gather, no
dynamic shapes, fuses into surrounding elementwise work under XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def tf_same_pads(size: int, k: int, s: int) -> tuple[int, int]:
    """TensorFlow SAME padding (lo, hi) for one spatial dim — asymmetric,
    bottom/right-heavy for even inputs (e.g. k=3, s=2, even size -> (0, 1)
    where symmetric k//2 pads (1, 1)).  Shared by the tf_-port backbones
    (EfficientNet/V2, the StdConv2dSame hybrid trunk)."""
    total = max((-(-size // s) - 1) * s + k - size, 0)
    return total // 2, total - total // 2


@functools.lru_cache(maxsize=64)
def _adaptive_pool_tables(length: int, out: int) -> tuple[np.ndarray, np.ndarray]:
    """Static gather indices + weights for torch adaptive_avg_pool1d.

    Returns (idx, w) with shapes [out, max_window]; idx are clamped input
    positions, w holds 1/window_size inside each bucket and 0 in the tail.
    """
    i = np.arange(out, dtype=np.int64)
    starts = (i * length) // out
    ends = -((-(i + 1) * length) // out)  # ceil((i+1)*L/out)
    sizes = ends - starts
    max_w = int(sizes.max())
    offs = np.arange(max_w, dtype=np.int64)[None, :]
    idx = starts[:, None] + offs
    valid = offs < sizes[:, None]
    idx = np.where(valid, idx, 0)
    w = np.where(valid, 1.0 / sizes[:, None], 0.0)
    return idx.astype(np.int32), w.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _adaptive_pool_matrix_np(length: int, out: int) -> np.ndarray:
    """[L, out] dense averaging matrix for the matmul formulation."""
    idx, w = _adaptive_pool_tables(length, out)
    mat = np.zeros((length, out), dtype=np.float32)
    for o in range(out):
        for k in range(idx.shape[1]):
            if w[o, k] > 0:
                mat[idx[o, k], o] += w[o, k]
    return mat


def adaptive_avg_pool_matrix(length: int, out: int) -> jnp.ndarray:
    """Dense [L, out] pooling matrix (for fusing the pool into an MXU matmul)."""
    return jnp.asarray(_adaptive_pool_matrix_np(length, out))


def adaptive_avg_pool1d(x: jnp.ndarray, out: int, *, use_matmul: bool = False,
                        precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """torch.nn.functional.adaptive_avg_pool1d over the last axis.

    Args:
        x: [..., L] input.
        out: target length.
        use_matmul: evaluate as an [L, out] matmul (MXU) instead of
            gather+weighted-sum (VPU).  Both are torch-exact up to fp
            summation order.
        precision: matmul precision for the use_matmul path (HIGHEST for
            torch-exact parity; pass DEFAULT for speed in bf16 pipelines).
    Returns:
        [..., out]
    """
    length = x.shape[-1]
    if length == out:
        return x
    if length % out == 0:
        # Uniform buckets: a reshape-mean, the fastest exact path.
        k = length // out
        return jnp.mean(x.reshape(*x.shape[:-1], out, k), axis=-1)
    if use_matmul:
        mat = adaptive_avg_pool_matrix(length, out).astype(x.dtype)
        return jax.lax.dot_general(
            x, mat,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            precision=precision,
        )
    idx, w = _adaptive_pool_tables(length, out)
    gathered = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=-1)
    gathered = gathered.reshape(*x.shape[:-1], *idx.shape)
    return jnp.sum(gathered * jnp.asarray(w), axis=-1)


def patchify(
    x: jnp.ndarray,
    patchsize: int = 3,
    stride: int = 1,
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Extract k x k zero-padded neighborhoods around every spatial site.

    Equivalent to the reference PatchMaker.patchify
    (Anomaly-Clustering/models/patchcore/patchcore.py:439-465): torch.nn.Unfold
    with padding=(k-1)//2 followed by reshape/permute into
    [B, n_patches, C, k, k].

    Args:
        x: [B, C, H, W]
        patchsize: neighborhood size k (odd).
        stride: spatial stride.
    Returns:
        (patches [B, nH*nW, C, k, k], (nH, nW))
    """
    b, c, h, w = x.shape
    pad = (patchsize - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    n_h = (h + 2 * pad - patchsize) // stride + 1
    n_w = (w + 2 * pad - patchsize) // stride + 1
    rows = []
    for di in range(patchsize):
        cols = []
        for dj in range(patchsize):
            sl = xp[:, :, di : di + (n_h - 1) * stride + 1 : stride,
                    dj : dj + (n_w - 1) * stride + 1 : stride]
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=2))  # [B, C, k, nH, nW]
    patches = jnp.stack(rows, axis=2)  # [B, C, k, k, nH, nW]
    patches = patches.transpose(0, 4, 5, 1, 2, 3)  # [B, nH, nW, C, k, k]
    patches = patches.reshape(b, n_h * n_w, c, patchsize, patchsize)
    return patches, (n_h, n_w)
