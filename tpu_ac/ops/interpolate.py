"""torch-exact spatial resampling (F.interpolate semantics).

The reference relies on three interpolate modes:

- bilinear, align_corners=False — multiscale feature alignment
  (patchcore.py:398-421) and RescaleSegmentor (common.py:199-201),
- bicubic with scale_factor — ViT positional-embedding resize
  (vision_transformer.py:187-191),
- nearest with scale_factor — alpha heat-map upsampling
  (examples/test.py:164-165).

Torch's conventions (half-pixel centers; ``scale = 1/scale_factor`` when an
explicit scale_factor is given, else ``in/out``; negative source clamped to 0
for linear but NOT for cubic; per-tap border clamping for cubic) are
reproduced exactly.  All index/weight tables are static per shape, so under
``jit`` each resize lowers to two dense contractions — no dynamic gathers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _source_coords(out_size: int, in_size: int, scale_factor: float | None,
                   *, cubic: bool) -> np.ndarray:
    if scale_factor is not None:
        scale = 1.0 / scale_factor
    else:
        scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    if not cubic:
        src = np.maximum(src, 0.0)
    return src


@functools.lru_cache(maxsize=256)
def _linear_tables(in_size: int, out_size: int, scale_factor: float | None):
    """(idx0, idx1, frac) arrays for 1-D linear resampling, torch semantics."""
    src = _source_coords(out_size, in_size, scale_factor, cubic=False)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float32)
    return i0.astype(np.int32), i1.astype(np.int32), frac


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights for the 4 taps at fractional offset t."""
    t = t.astype(np.float64)
    def w1(x):  # |x| <= 1
        return ((a + 2) * x - (a + 3)) * x * x + 1
    def w2(x):  # 1 < |x| < 2
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a
    return np.stack([w2(t + 1.0), w1(t), w1(1.0 - t), w2(2.0 - t)], axis=-1)


@functools.lru_cache(maxsize=256)
def _cubic_tables(in_size: int, out_size: int, scale_factor: float | None):
    """(idx [out,4], w [out,4]) for 1-D bicubic resampling, torch semantics."""
    src = _source_coords(out_size, in_size, scale_factor, cubic=True)
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    taps = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=-1)
    taps = np.clip(taps, 0, in_size - 1)
    w = _cubic_kernel(frac).astype(np.float32)
    return taps.astype(np.int32), w


@functools.lru_cache(maxsize=256)
def _nearest_tables(in_size: int, out_size: int, scale_factor: float | None):
    if scale_factor is not None:
        scale = 1.0 / scale_factor
    else:
        scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale)
    return np.minimum(idx, in_size - 1).astype(np.int32)


def _resample_axis_weights(x: jnp.ndarray, axis: int, idx: np.ndarray,
                           w: np.ndarray) -> jnp.ndarray:
    """Weighted multi-tap gather along one axis: out[o] = sum_k w[o,k]*x[idx[o,k]]."""
    taps = []
    for k in range(idx.shape[1]):
        g = jnp.take(x, jnp.asarray(idx[:, k]), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = -1
        taps.append(g * jnp.asarray(w[:, k]).reshape(shape))
    out = taps[0]
    for t in taps[1:]:
        out = out + t
    return out


def interpolate_bilinear(x: jnp.ndarray, size: tuple[int, int],
                         scale_factor: tuple[float, float] | None = None) -> jnp.ndarray:
    """F.interpolate(mode="bilinear", align_corners=False) over last 2 axes."""
    h, w_in = x.shape[-2], x.shape[-1]
    oh, ow = size
    sf_h, sf_w = (scale_factor if scale_factor is not None else (None, None))
    i0, i1, fh = _linear_tables(h, oh, sf_h)
    j0, j1, fw = _linear_tables(w_in, ow, sf_w)
    idx_h = np.stack([i0, i1], axis=-1)
    w_h = np.stack([1.0 - fh, fh], axis=-1).astype(np.float32)
    idx_w = np.stack([j0, j1], axis=-1)
    w_w = np.stack([1.0 - fw, fw], axis=-1).astype(np.float32)
    out = _resample_axis_weights(x, x.ndim - 2, idx_h, w_h)
    out = _resample_axis_weights(out, x.ndim - 1, idx_w, w_w)
    return out


def interpolate_bicubic(x: jnp.ndarray, size: tuple[int, int] | None = None,
                        scale_factor: tuple[float, float] | None = None) -> jnp.ndarray:
    """F.interpolate(mode="bicubic", align_corners=False) over last 2 axes."""
    h, w_in = x.shape[-2], x.shape[-1]
    if size is None:
        assert scale_factor is not None
        size = (int(np.floor(h * scale_factor[0])), int(np.floor(w_in * scale_factor[1])))
    oh, ow = size
    sf_h, sf_w = (scale_factor if scale_factor is not None else (None, None))
    idx_h, w_h = _cubic_tables(h, oh, sf_h)
    idx_w, w_w = _cubic_tables(w_in, ow, sf_w)
    out = _resample_axis_weights(x, x.ndim - 2, idx_h, w_h)
    out = _resample_axis_weights(out, x.ndim - 1, idx_w, w_w)
    return out


def interpolate_nearest(x: jnp.ndarray, size: tuple[int, int] | None = None,
                        scale_factor: tuple[float, float] | None = None) -> jnp.ndarray:
    """F.interpolate(mode="nearest") over the last 2 axes."""
    h, w_in = x.shape[-2], x.shape[-1]
    if size is None:
        assert scale_factor is not None
        size = (int(np.floor(h * scale_factor[0])), int(np.floor(w_in * scale_factor[1])))
    oh, ow = size
    sf_h, sf_w = (scale_factor if scale_factor is not None else (None, None))
    idx_h = _nearest_tables(h, oh, sf_h)
    idx_w = _nearest_tables(w_in, ow, sf_w)
    out = jnp.take(x, jnp.asarray(idx_h), axis=x.ndim - 2)
    out = jnp.take(out, jnp.asarray(idx_w), axis=x.ndim - 1)
    return out
