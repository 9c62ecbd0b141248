"""Pallas TPU kernels for the pipeline's hot paths.

- ``fused_attention``: softmax(QK^T)V without materializing the [S, S]
  score matrix in HBM (the reference's torch attention materializes it per
  head, vision_transformer.py:85-89).
- ``min_dists_kernel``: tiled pairwise-distance + per-image row-min — the
  inner loop of the alpha weights — without the [P, N*P] intermediate.
"""

from tpu_ac.kernels.attention import fused_attention
from tpu_ac.kernels.distances import min_dists_to_sets

__all__ = ["fused_attention", "min_dists_to_sets"]
