"""Patch-score -> pixel-mask segmentation (common.py:186-208).

Bilinear upsample of the patch-score grid to image resolution followed by a
sigma=4 gaussian blur.  The reference hops device->host to run
scipy.ndimage per image; here both stages are one jitted XLA program
(separable blur = two small convs that fuse with the resize).
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp

from tpu_ac.ops.gaussian import gaussian_blur
from tpu_ac.ops.interpolate import interpolate_bilinear


class RescaleSegmentor:
    def __init__(self, target_size=(224, 224), smoothing: float = 4.0):
        if isinstance(target_size, int):
            target_size = (target_size, target_size)
        self.target_size = tuple(target_size)
        self.smoothing = smoothing

        @jax.jit
        def _segment(scores: jnp.ndarray) -> jnp.ndarray:
            x = scores[:, None]  # [B, 1, gh, gw]
            x = interpolate_bilinear(x, size=self.target_size)
            x = x[:, 0]
            return gaussian_blur(x, sigma=self.smoothing)

        self._segment = _segment

    def convert_to_segmentation(self, patch_scores) -> np.ndarray:
        """[B, gh, gw] patch scores -> [B, H, W] smoothed masks."""
        return np.asarray(self._segment(jnp.asarray(patch_scores)))
