"""Shared torch-layout dense/BN primitives for the model zoo.

One implementation of the two helpers every transformer/conv family was
re-defining locally: the ``x @ W^T + b`` matmul over torch ``(out, in)``
weights (torch.nn.Linear semantics) and folded inference BatchNorm on
NCHW maps (torch.nn.BatchNorm2d.eval semantics).  A precision or layout
tweak must land in exactly one place.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def torch_linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                 precision) -> jnp.ndarray:
    """x @ W^T + b with torch-layout (out, in) weights."""
    y = jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        precision=precision)
    return y if b is None else y + b


def bn_inference_nchw(params: Mapping[str, jnp.ndarray], name: str,
                      x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Folded inference BatchNorm2d on [B, C, H, W] using running stats."""
    w = params[name + ".weight"][None, :, None, None]
    b = params[name + ".bias"][None, :, None, None]
    rm = params[name + ".running_mean"][None, :, None, None]
    rv = params[name + ".running_var"][None, :, None, None]
    return (x - rm) * jax.lax.rsqrt(rv + eps) * w + b
