"""Anomaly-clustering algorithm layer.

TPU-native replacement for the reference's alpha-weight math
(Anomaly-Clustering/models/patchcore/utils.py:222-277) plus the host-side
clustering/metrics driver (Anomaly-Clustering/examples/test.py).
"""

from tpu_ac.cluster.alpha import (
    weight_distance_unsupervised,
    weight_distance_supervised,
    alpha_from_weights,
    matrix_alpha_unsupervised,
    matrix_alpha_supervised,
    matrix_alpha_average,
    weighted_embedding,
)
from tpu_ac.cluster.metrics import (
    best_map,
    hungarian_accuracy,
    hungarian_evaluate,
    hungarian_match,
    clustering_scores,
    agglomerative_cluster,
    encode_labels,
)

__all__ = [
    "weight_distance_unsupervised",
    "weight_distance_supervised",
    "alpha_from_weights",
    "matrix_alpha_unsupervised",
    "matrix_alpha_supervised",
    "matrix_alpha_average",
    "weighted_embedding",
    "best_map",
    "hungarian_accuracy",
    "hungarian_evaluate",
    "hungarian_match",
    "clustering_scores",
    "agglomerative_cluster",
    "encode_labels",
]
