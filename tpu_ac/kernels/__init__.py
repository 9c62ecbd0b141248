"""Pallas TPU kernels for the pipeline's hot paths.

- ``min_dists_all_pairs``: one fused tiled pairwise-distance + row-min
  launch over the whole image set — the inner loop of the alpha weights —
  without the [P, N*P] distance intermediate ever touching HBM.  Three
  precision modes: f32 (parity), bf16c (compensated hi/lo split), bf16.

A fused Pallas attention kernel used to live here; it lost to XLA's fused
dense attention at the flagship ViT-B/8 shape in both f32 (151 vs 164
img/s) and bf16 (131 vs 125 ms per 32-image embed), so the XLA path is the
only attention implementation (models/vit.py still accepts a custom
``attention_impl`` callable for experimentation).
"""

from tpu_ac.kernels.distances import min_dists_all_pairs, min_dists_to_sets

__all__ = ["min_dists_all_pairs", "min_dists_to_sets"]
