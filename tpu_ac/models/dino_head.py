"""DINO projection head (vision_transformer.py:257-291), functional JAX.

MLP (Linear-GELU-[Linear-GELU]-Linear) -> L2 normalize -> weight-normalized
final linear.  Weight norm keeps the torch parameterization
(weight_g * weight_v / ||weight_v||, with weight_g frozen at 1 when
``norm_last_layer``), so converted checkpoints reproduce torch outputs.
"""

from __future__ import annotations

import math
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.ops.normalize import l2_normalize

Params = Mapping[str, jnp.ndarray]


def init_dino_head_params(seed: int, in_dim: int, out_dim: int,
                          nlayers: int = 3, hidden_dim: int = 2048,
                          bottleneck_dim: int = 256) -> dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)

    def tn(shape):
        std = 0.02
        x = rng.standard_normal(shape) * std
        return np.clip(x, -2 * std, 2 * std).astype(np.float32)

    p: dict[str, np.ndarray] = {}
    nlayers = max(nlayers, 1)
    if nlayers == 1:
        p["mlp.weight"] = tn((bottleneck_dim, in_dim))
        p["mlp.bias"] = np.zeros((bottleneck_dim,), np.float32)
    else:
        dims = [in_dim] + [hidden_dim] * (nlayers - 1) + [bottleneck_dim]
        for li in range(nlayers):
            # torch nn.Sequential indices: Linears at 0/2/4 (GELUs at 1/3),
            # so converted DINO training checkpoints map key-for-key
            p[f"mlp.{2 * li}.weight"] = tn((dims[li + 1], dims[li]))
            p[f"mlp.{2 * li}.bias"] = np.zeros((dims[li + 1],), np.float32)
    p["last_layer.weight_g"] = np.ones((out_dim, 1), np.float32)
    p["last_layer.weight_v"] = (
        rng.standard_normal((out_dim, bottleneck_dim)) /
        math.sqrt(bottleneck_dim)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in p.items()}


def dino_head_forward(params: Params, x: jnp.ndarray,
                      precision=jax.lax.Precision.DEFAULT) -> jnp.ndarray:
    def lin(h, w, b):
        y = jax.lax.dot_general(
            h, w, dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
            precision=precision)
        return y + b if b is not None else y

    if "mlp.weight" in params:  # nlayers == 1: a bare nn.Linear
        x = lin(x, params["mlp.weight"], params["mlp.bias"])
    else:
        # torch Sequential layout: Linears at even indices, GELUs between
        li = 0
        while f"mlp.{2 * li}.weight" in params:
            x = lin(x, params[f"mlp.{2 * li}.weight"],
                    params[f"mlp.{2 * li}.bias"])
            if f"mlp.{2 * (li + 1)}.weight" in params:
                x = jax.nn.gelu(x, approximate=False)
            li += 1
    x = l2_normalize(x, axis=-1)
    wv = params["last_layer.weight_v"]
    wg = params["last_layer.weight_g"]
    w = wg * wv / jnp.linalg.norm(wv, axis=1, keepdims=True)
    return lin(x, w, None)
