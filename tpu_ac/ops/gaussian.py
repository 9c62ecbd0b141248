"""Separable Gaussian blur matching scipy.ndimage.gaussian_filter.

Used by the segmentation rescaler (reference:
Anomaly-Clustering/models/patchcore/common.py:186-208, sigma=4).  scipy's
defaults are order=0, mode="reflect" (edge-repeating symmetric padding),
truncate=4.0, radius = int(truncate*sigma + 0.5).  The blur is evaluated as
two 1-D convolutions, which XLA maps onto the VPU/MXU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    phi /= phi.sum()
    # scipy correlates with the reversed kernel; symmetric here, so no-op.
    return phi.astype(np.float32)


def _blur_axis(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    radius = (len(kernel) - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode="symmetric")  # scipy "reflect" == np "symmetric"
    k = jnp.asarray(kernel)
    out = jnp.zeros_like(x)
    for t in range(len(kernel)):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + x.shape[axis])
        out = out + xp[tuple(sl)] * k[t]
    return out


def gaussian_blur(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian blur over the last two axes (scipy.ndimage.gaussian_filter)."""
    kernel = _gaussian_kernel(sigma, truncate)
    out = _blur_axis(x, kernel, x.ndim - 2)
    out = _blur_axis(out, kernel, x.ndim - 1)
    return out
