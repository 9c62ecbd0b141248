"""Video-segmentation label propagation (DAVIS eval workload).

Rebuild of dino-main/eval_video_segmentation.py:100-180: per target frame,
attention between target patch features and a context queue of previous
frames propagates their segmentation masks — exp(sim/0.1) affinities with
optional spatial neighborhood restriction, top-k sparsification over the
source axis, and affinity-weighted label averaging.

The whole propagation step is one jitted function over static context
size; the video loop (queue management) stays on the host like the
reference's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.normalize import l2_normalize


@functools.lru_cache(maxsize=8)
def restrict_neighborhood(h: int, w: int, size: int) -> np.ndarray:
    """[h*w, h*w] binary mask allowing attention within a (2*size+1)^2
    spatial window (eval_video_segmentation.py:70-83)."""
    mask = np.zeros((h, w, h, w), np.float32)
    for i in range(h):
        for j in range(w):
            lo_i, hi_i = max(0, i - size), min(h, i + size + 1)
            lo_j, hi_j = max(0, j - size), min(w, j + size + 1)
            mask[i, j, lo_i:hi_i, lo_j:hi_j] = 1.0
    return mask.reshape(h * w, h * w)


def _neighborhood_mask(h: int, w: int, size: int) -> jnp.ndarray:
    """Traceable equivalent of :func:`restrict_neighborhood` — the window
    [max(0, i-size), min(h, i+size+1)) is exactly |di| <= size, so the mask
    is computed on-device instead of inlining an [h*w, h*w] f32 constant
    into the jitted program (a 60x112 DAVIS grid would be a 180 MB HLO
    constant, which the remote compile service rejects)."""
    idx = jnp.arange(h * w)
    qi, qj = idx // w, idx % w
    return ((jnp.abs(qi[:, None] - qi[None, :]) <= size)
            & (jnp.abs(qj[:, None] - qj[None, :]) <= size)
            ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "grid", "topk", "temperature", "size_mask_neighborhood"))
def propagate_labels(feat_tar: jnp.ndarray, context_feats: jnp.ndarray,
                     context_segs: jnp.ndarray, *, grid: tuple[int, int],
                     topk: int = 5, temperature: float = 0.1,
                     size_mask_neighborhood: int = 12) -> jnp.ndarray:
    """One propagation step.

    Args:
        feat_tar: [h*w, D] target-frame patch features (CLS dropped).
        context_feats: [n_ctx, h*w, D] context-frame features.
        context_segs: [n_ctx, C, h, w] context soft segmentation masks.
        grid: (h, w) patch grid.
        topk: per-target-query top-k source sparsification.
        temperature: affinity softmax temperature.
        size_mask_neighborhood: spatial window radius (0 disables).
    Returns:
        [C, h, w] propagated soft mask for the target frame.
    """
    h, w = grid
    n_ctx = context_feats.shape[0]
    ft = l2_normalize(feat_tar, axis=1)
    fs = l2_normalize(context_feats, axis=2)
    # aff[n, q, s] = exp(<tar_q, src_s>/T)
    aff = jnp.exp(jnp.einsum("qd,nsd->nqs", ft, fs) / temperature)
    if size_mask_neighborhood > 0:
        aff = aff * _neighborhood_mask(h, w, size_mask_neighborhood)[None]
    # [n_ctx*s, q]: sparsify over sources per query, renormalize
    aff = aff.transpose(0, 2, 1).reshape(n_ctx * h * w, h * w)
    tk = jax.lax.top_k(aff.T, topk)[0][:, -1]  # per-query k-th value
    aff = jnp.where(aff >= tk[None, :], aff, 0.0)
    aff = aff / jnp.sum(aff, axis=0, keepdims=True)
    c = context_segs.shape[1]
    segs = context_segs.reshape(n_ctx, c, h * w).transpose(0, 2, 1)
    segs = segs.reshape(n_ctx * h * w, c)  # [sources, C]
    out = segs.T @ aff  # [C, q]
    return out.reshape(c, h, w)


def norm_mask(mask: np.ndarray) -> np.ndarray:
    """Per-channel min-max normalization (eval_video_segmentation.py:100-108)."""
    out = mask.copy()
    for c in range(mask.shape[0]):
        m = out[c]
        if m.max() > 0:
            m = m - m.min()
            out[c] = m / m.max()
    return out


def to_one_hot(labels: np.ndarray, n_dims: int | None = None) -> np.ndarray:
    """[h, w] integer labels -> [C, h, w] one-hot
    (eval_video_segmentation.py:176-188)."""
    if n_dims is None:
        n_dims = int(labels.max() + 1)
    h, w = labels.shape
    out = np.zeros((n_dims, h, w), np.float32)
    for c in range(n_dims):
        out[c] = labels == c
    return out


def propagate_video(frame_features: list[np.ndarray], first_mask: np.ndarray,
                    grid: tuple[int, int], *, n_last_frames: int = 7,
                    topk: int = 5, size_mask_neighborhood: int = 12,
                    normalize: bool = True) -> list[np.ndarray]:
    """Propagate the first frame's mask through a video
    (eval_video_segmentation.py main loop: first frame + queue of the
    n_last_frames most recent predictions as context).

    frame_features: per frame [h*w, D]; first_mask: [C, h, w] one-hot.
    Returns per-frame [C, h, w] soft masks (index 0 = the given mask).
    ``normalize=False`` returns the RAW propagated masks — the DAVIS CLI
    needs them because the reference upsamples by patch_size FIRST and
    norm_masks at pixel resolution (eval_video_segmentation.py:76-78);
    per-channel min-max before vs after bilinear resample changes the
    argmax near channel boundaries.
    """
    que: list[tuple[np.ndarray, np.ndarray]] = []
    first = (np.asarray(frame_features[0]), np.asarray(first_mask))
    out = [np.asarray(first_mask)]
    for feat in frame_features[1:]:
        used = [first] + que[-n_last_frames:]
        ctx_feats = jnp.asarray(np.stack([u[0] for u in used]))
        ctx_segs = jnp.asarray(np.stack([u[1] for u in used]))
        seg = propagate_labels(jnp.asarray(feat), ctx_feats, ctx_segs,
                               grid=grid, topk=topk,
                               size_mask_neighborhood=size_mask_neighborhood)
        seg = np.asarray(seg)
        # the RAW propagated mask feeds the queue; norm_mask applies only
        # to the returned copy (eval_video_segmentation.py:70-75 queues
        # deepcopy(frame_tar_avg) BEFORE interpolate + norm_mask)
        que.append((np.asarray(feat), seg))
        out.append(norm_mask(seg) if normalize else seg)
    return out
