"""PatchCore anomaly *detection* capability (CVPR'22), TPU-native.

Replaces patchcore-inspection-main/src/patchcore: coreset subsampling,
k-NN memory-bank scorer (the FAISS replacement — tiled MXU distance
matmuls + top-k), score rescale/segmentation, and AUROC metrics.
"""

from tpu_ac.detect.sampler import (
    IdentitySampler,
    RandomSampler,
    GreedyCoresetSampler,
    ApproximateGreedyCoresetSampler,
)
from tpu_ac.detect.scorer import NearestNeighbourScorer
from tpu_ac.detect.segmentor import RescaleSegmentor
from tpu_ac.detect.metrics import (
    compute_imagewise_retrieval_metrics,
    compute_pixelwise_retrieval_metrics,
    compute_pro,
)
from tpu_ac.detect.patchcore import PatchCore

__all__ = [
    "IdentitySampler",
    "RandomSampler",
    "GreedyCoresetSampler",
    "ApproximateGreedyCoresetSampler",
    "NearestNeighbourScorer",
    "RescaleSegmentor",
    "compute_imagewise_retrieval_metrics",
    "compute_pixelwise_retrieval_metrics",
    "compute_pro",
    "PatchCore",
]

from tpu_ac.detect.approx import (  # noqa: E402
    IVFFlatIndex,
    ApproximateNearestNeighbourScorer,
    kmeans,
)

__all__ += ["IVFFlatIndex", "ApproximateNearestNeighbourScorer", "kmeans"]
