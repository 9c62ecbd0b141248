"""Normalization primitives.

``adhoc_layernorm`` replicates the reference's quirk of instantiating a fresh
``torch.nn.LayerNorm([C, H, W])`` inside the embedding forward
(Anomaly-Clustering/models/patchcore/patchcore.py:384-385): the module is
never trained, so its affine parameters are identity — the op is a plain
zero-mean/unit-variance normalization over all non-batch dims with eps=1e-5
and biased variance.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def adhoc_layernorm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over all axes except the first, identity affine."""
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def layernorm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
              eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the trailing axis with affine params (ViT blocks)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * weight + bias


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2): x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
