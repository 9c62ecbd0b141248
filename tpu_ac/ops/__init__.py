"""torch-exact numerical primitives, implemented in JAX.

These ops replicate, bit-closely (fp-tolerance), the semantics of the torch
ops the reference pipeline depends on, so that golden parity holds:

- :func:`adaptive_avg_pool1d`  (torch.nn.functional.adaptive_avg_pool1d)
- :func:`patchify`             (torch.nn.Unfold(kernel, stride, padding))
- :func:`interpolate_bilinear` (F.interpolate mode="bilinear",
                                align_corners=False)
- :func:`interpolate_bicubic`  (F.interpolate mode="bicubic")
- :func:`interpolate_nearest`  (F.interpolate mode="nearest")
- :func:`adhoc_layernorm`      (fresh nn.LayerNorm([C,H,W]) per call)
- :func:`cdist`                (torch.cdist, p=2, mm path)
- :func:`gaussian_blur`        (scipy.ndimage.gaussian_filter)
"""

from tpu_ac.ops.pooling import (
    adaptive_avg_pool1d,
    adaptive_avg_pool_matrix,
    patchify,
)
from tpu_ac.ops.interpolate import (
    interpolate_bilinear,
    interpolate_bicubic,
    interpolate_nearest,
)
from tpu_ac.ops.normalize import adhoc_layernorm, l2_normalize
from tpu_ac.ops.distances import cdist, pairwise_sq_dists, knn, knn_ip
from tpu_ac.ops.gaussian import gaussian_blur

__all__ = [
    "adaptive_avg_pool1d",
    "adaptive_avg_pool_matrix",
    "patchify",
    "interpolate_bilinear",
    "interpolate_bicubic",
    "interpolate_nearest",
    "adhoc_layernorm",
    "l2_normalize",
    "cdist",
    "pairwise_sq_dists",
    "knn",
    "knn_ip",
    "gaussian_blur",
]
