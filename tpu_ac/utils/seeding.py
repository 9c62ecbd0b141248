"""Determinism helpers (fix_seeds / same_seeds equivalents).

The reference seeds python/numpy/torch + cudnn.deterministic
(examples/main.py:62-69, models/patchcore/utils.py:112-127,
dino-main/utils.py:215-221).  JAX programs are deterministic by
construction given fixed PRNG keys and a fixed compile; this seeds the
host-side randomness (python, numpy) and returns a jax PRNG key for
anything that wants one.
"""

from __future__ import annotations

import random

import numpy as np


def fix_seeds(seed: int = 2023, with_jax_key: bool = True):
    random.seed(seed)
    np.random.seed(seed)
    if with_jax_key:
        import jax

        return jax.random.PRNGKey(seed)
    return None
