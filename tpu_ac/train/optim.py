"""Optimizers beyond optax's defaults: LARS.

LARS (dino-main/utils.py:553-591) is the optimizer DINO uses for
ResNet-family training: SGD with a per-parameter "trust ratio"
eta * ||p|| / ||g + wd*p|| scaling, skipping 1-D params (biases/norms) for
both weight decay and the adaptive scaling — matching the reference's
``exclude_bias_and_norm`` filters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LARSState(NamedTuple):
    momentum: optax.Updates


def lars(learning_rate: float | None = None, momentum: float = 0.9,
         weight_decay: float = 0.0, eta: float = 0.001,
         weight_decay_filter=None, lars_adaptation_filter=None
         ) -> optax.GradientTransformation:
    """LARS gradient transformation.

    By default 1-D parameters (biases, norm scales) skip weight decay and
    adaptation (utils.py:569-573 one_dim check).  Emits update = -lr * mu
    when learning_rate is given, else the raw (positive) momentum buffer.
    """

    def default_filter(path_or_param):
        return getattr(path_or_param, "ndim", 2) != 1

    wd_filter = weight_decay_filter or default_filter
    ad_filter = lars_adaptation_filter or default_filter

    def init(params):
        return LARSState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("lars requires params")

        def one(g, p, mu):
            dp = g
            if wd_filter(p):
                dp = dp + weight_decay * p
            if ad_filter(p):
                p_norm = jnp.linalg.norm(p)
                g_norm = jnp.linalg.norm(dp)
                q = jnp.where(
                    (p_norm > 0.0) & (g_norm > 0.0),
                    eta * p_norm / jnp.maximum(g_norm, 1e-12), 1.0)
                dp = dp * q
            return momentum * mu + dp

        new_mu = jax.tree.map(one, grads, params, state.momentum)
        scale = -learning_rate if learning_rate is not None else 1.0
        updates = jax.tree.map(lambda m: scale * m, new_mu)
        return updates, LARSState(momentum=new_mu)

    return optax.GradientTransformation(init, update)
