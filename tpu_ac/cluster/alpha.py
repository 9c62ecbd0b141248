"""Alpha patch-weighting math — the WACV'23 Anomaly Clustering core.

Reference (Anomaly-Clustering/models/patchcore/utils.py:222-277) computes,
per test image i with patch embeddings Z[i] in R^{P x D}:

- unsupervised: W[i,p] = mean_{j != i} min_q ||Z[i,p] - Z[j,q]||   (L222-227)
- supervised:   W[i,p] = min_{j,q}    ||Z[i,p] - Z_train[j,q]||    (L230-237)
- alpha[i]      = exp(W[i]/tau) row-normalized; tau=0 -> one-hot of the
                  argmax (ties split uniformly)                    (L240-277)
- X[i]          = alpha[i] @ Z[i]  (weighted-average embedding,
                  examples/main.py:294-296)

The reference loops image-by-image in Python with per-pair torch.cdist
calls.  Here the same math is a single XLA program: one [P, N*P] tiled
distance matmul per image inside a lax.map, with the min/mean reductions
fused — O(N^2 P^2 D) FLOPs on the MXU, no host round-trips.

The exp-normalization is evaluated with row-max subtraction (exact for a
softmax) so f32 never overflows where the reference's f64 exp(+d/tau)
could; tau=0 keeps the reference's exact tie-splitting semantics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.distances import pairwise_sq_dists


def _min_dists_to_set(zi: jnp.ndarray, zall_flat: jnp.ndarray,
                      n_images: int,
                      precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """min_q ||zi[p] - Z[j,q]|| for every (p, j): [P, D] x [N*P, D] -> [P, N]."""
    p = zi.shape[0]
    d2 = pairwise_sq_dists(zi, zall_flat, precision=precision)  # [P, N*P]
    d2 = d2.reshape(p, n_images, -1)
    return jnp.sqrt(jnp.min(d2, axis=-1))


# XLA equivalents of the kernel precision modes: HIGHEST = multi-pass f32,
# HIGH = bf16_3x (the compensated decomposition XLA already implements),
# DEFAULT = single-pass bf16 multiplies.
_XLA_PRECISION = {
    "f32": jax.lax.Precision.HIGHEST,
    "bf16c": jax.lax.Precision.HIGH,
    "bf16": jax.lax.Precision.DEFAULT,
}


def _use_pallas(impl: str) -> bool:
    if impl == "auto":
        return jax.default_backend() == "tpu"
    return impl == "pallas"


def weight_distance_unsupervised(Z: jnp.ndarray, impl: str = "auto",
                                 n_valid: int | None = None,
                                 precision: str = "f32") -> jnp.ndarray:
    """Vectorized Weight_Distance_Unsupervised (utils.py:222-227).

    Args:
        Z: [N, P, D] patch embeddings of the test set (rows beyond
            ``n_valid`` are padding and masked out of the bank sums;
            their own output rows are garbage the caller slices off).
        impl: "auto" (pallas kernel on TPU, XLA elsewhere) | "xla" | "pallas".
        n_valid: number of real images (defaults to N).  Padding N up to a
            bucket size keeps one compiled program across category sweeps.
        precision: "f32" (parity) | "bf16c" (compensated bf16 — hi/lo split
            recovers ~f32 products at half the DMA) | "bf16" (single-pass,
            fastest).  See tpu_ac.kernels.distances.
    Returns:
        W: [N, P]; W[i,p] = mean over j != i of min_q ||Z[i,p]-Z[j,q]||.

    The j == i term of the sum is ~0 (min over q includes q = p; the mm
    formulation leaves a cancellation floor — ~1e-3 in XLA f32, ~|z|*2^-9
    in the kernel's compensated f32 mode — both ~5e-4 relative to real
    distances), so the masked mean is sum_j / (n_valid-1) without masking
    the diagonal, exactly like the reference's torch.cdist mm path.
    """
    n, p, d = Z.shape
    nv = n if n_valid is None else n_valid
    # n_valid may be a TRACED scalar (so one compiled program serves every
    # category size in a sweep — the padded shape is the compile key, the
    # valid count is data); python ints keep the old constant-folded path.
    if isinstance(nv, (int, np.integer)):
        valid_col = None if nv == n else (np.arange(n) < nv)
    else:
        valid_col = jnp.arange(n) < nv

    if _use_pallas(impl):
        from tpu_ac.kernels.distances import min_dists_all_pairs

        # symmetric: the (j, i) tile is the (i, j) tile transposed, so the
        # kernel computes only the upper triangle and emits both row- and
        # col-mins — ~2x less MXU work (the dominant alpha cost at large N)
        mins = min_dists_all_pairs(Z, Z, precision=precision,
                                   symmetric=True)  # [N, N, P]
        if valid_col is not None:
            mins = jnp.where(valid_col[None, :, None], mins, 0.0)
        # clamp defends direct callers against 0/0 NaN at nv=1 (the
        # pipeline's compute_alpha_X raises loudly before dispatch)
        return jnp.sum(mins, axis=1) / jnp.maximum(nv - 1, 1)

    z_flat = Z.reshape(n * p, d)
    xla_precision = _XLA_PRECISION[precision]

    def per_image(zi: jnp.ndarray) -> jnp.ndarray:
        mins = _min_dists_to_set(zi, z_flat, n, xla_precision)  # [P, N]
        if valid_col is not None:
            mins = jnp.where(valid_col[None, :], mins, 0.0)
        return jnp.sum(mins, axis=-1) / jnp.maximum(nv - 1, 1)

    return jax.lax.map(per_image, Z)


def weight_distance_supervised(Z: jnp.ndarray, Z_train: jnp.ndarray,
                               impl: str = "auto",
                               n_train_valid: int | None = None,
                               precision: str = "f32") -> jnp.ndarray:
    """Vectorized Weight_Distance_Supervised (utils.py:230-237).

    Args:
        Z: [N, P, D] test patch embeddings.
        Z_train: [Nt, P, D] normal-image (train) patch embeddings (rows
            beyond ``n_train_valid`` are padding, masked out of the min).
        impl: "auto" | "xla" | "pallas" (see weight_distance_unsupervised).
        precision: "f32" | "bf16c" | "bf16" (see weight_distance_unsupervised).
    Returns:
        W: [N, P]; W[i,p] = min over all train patches of the L2 distance.
    """
    nt, pt, d = Z_train.shape
    ntv = nt if n_train_valid is None else n_train_valid
    if isinstance(ntv, (int, np.integer)):
        valid_col = None if ntv == nt else (np.arange(nt) < ntv)
    else:  # traced scalar: see weight_distance_unsupervised
        valid_col = jnp.arange(nt) < ntv

    if _use_pallas(impl):
        from tpu_ac.kernels.distances import min_dists_all_pairs

        mins = min_dists_all_pairs(Z, Z_train, precision=precision)
        if valid_col is not None:
            mins = jnp.where(valid_col[None, :, None], mins, jnp.inf)
        return jnp.min(mins, axis=1)

    zt_flat = Z_train.reshape(nt * pt, d)
    xla_precision = _XLA_PRECISION[precision]

    def per_image(zi: jnp.ndarray) -> jnp.ndarray:
        mins = _min_dists_to_set(zi, zt_flat, nt, xla_precision)  # [P, Nt]
        if valid_col is not None:
            mins = jnp.where(valid_col[None, :], mins, jnp.inf)
        return jnp.min(mins, axis=-1)

    return jax.lax.map(per_image, Z)


def alpha_from_weights(W: jnp.ndarray, tau: float, k: float = 1.0) -> jnp.ndarray:
    """Row-normalized exp(W/tau) weights (utils.py:240-277).

    tau = 0 reproduces the reference's special case: a one-hot (uniform over
    ties) of the row argmax.  For tau > 0 the row-max is subtracted before
    exponentiation — mathematically exact (softmax shift invariance; the
    constant k likewise cancels) and overflow-free in f32.
    """
    if math.isclose(tau, 0.0):
        hot = (W == jnp.max(W, axis=1, keepdims=True)).astype(W.dtype)
        return hot / jnp.sum(hot, axis=1, keepdims=True)
    scaled = W / tau
    scaled = scaled - jnp.max(scaled, axis=1, keepdims=True)
    e = jnp.exp(scaled)
    return e / jnp.sum(e, axis=1, keepdims=True)


def matrix_alpha_unsupervised(tau: float, k: float, Z: jnp.ndarray) -> jnp.ndarray:
    """Matrix_Alpha_Unsupervised (utils.py:240-257): [N, P, D] -> [N, P]."""
    return alpha_from_weights(weight_distance_unsupervised(Z), tau, k)


def matrix_alpha_supervised(tau: float, k: float, Z: jnp.ndarray,
                            Z_train: jnp.ndarray) -> jnp.ndarray:
    """Matrix_Alpha_Supervised (utils.py:260-277): -> [N, P]."""
    return alpha_from_weights(weight_distance_supervised(Z, Z_train), tau, k)


def matrix_alpha_average(Z: jnp.ndarray) -> jnp.ndarray:
    """Uniform weights — the 'average' mode (examples/main.py:292)."""
    n, p, _ = Z.shape
    return jnp.full((n, p), 1.0 / p, dtype=Z.dtype)


def max_hausdorff_distance(a, b) -> float:
    """Max_Hausdorff_Distance (utils.py:280-281).

    The reference calls ``max(directed_hausdorff(i, j),
    directed_hausdorff(i, j))[0]`` — both arguments in the SAME order, so
    despite the name it computes the *directed* Hausdorff distance
    sup_p inf_q ||a_p - b_q|| rather than the symmetric one.  That quirk is
    reproduced (the function is unused by any reference pipeline; it ships
    for API completeness).
    """
    d2 = np.asarray(pairwise_sq_dists(jnp.asarray(a, jnp.float32),
                                      jnp.asarray(b, jnp.float32)))
    return float(np.sqrt(d2.min(axis=1).max()))


def weighted_embedding(alpha: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """X = bmm(alpha, Z): [N, P] x [N, P, D] -> [N, D] (examples/main.py:294-296)."""
    return jnp.einsum("np,npd->nd", alpha.astype(Z.dtype), Z,
                      precision=jax.lax.Precision.HIGHEST)
