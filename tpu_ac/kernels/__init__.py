"""Pallas TPU kernels for the pipeline's hot paths.

- ``min_dists_all_pairs``: one fused tiled pairwise-distance + row-min
  launch over the whole image set — the inner loop of the alpha weights —
  without the [P, N*P] distance intermediate ever touching HBM.  Three
  precision modes: f32 (parity), bf16c (compensated hi/lo split), bf16.

- ``attention.flash_attention_impl``: opt-in wrapper over the stock Pallas
  TPU flash kernel (``attention_impl="flash"`` + ``seq_pad=True`` on the
  pipeline/ViT).  It MEASURES SLOWER than XLA's fused dense attention at
  the flagship ViT-B/8 shape (135-231 vs 123 ms per batch-32 embed — see
  PERF.md), so XLA is the default attention path; the wrapper ships for
  experimentation on other shapes (a hand-written r2 kernel that also lost
  was deleted).
"""

from tpu_ac.kernels.distances import min_dists_all_pairs, min_dists_to_sets

__all__ = ["min_dists_all_pairs", "min_dists_to_sets"]
