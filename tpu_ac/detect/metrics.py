"""Detection metrics (reference: models/patchcore/metrics.py:6-76).

Host-side sklearn on small score arrays — image-level AUROC and pixel-level
AUROC with the optimal-F1 threshold statistics.
"""

from __future__ import annotations

import numpy as np
from sklearn import metrics as skm


def compute_imagewise_retrieval_metrics(anomaly_prediction_weights,
                                        anomaly_ground_truth_labels) -> dict:
    """Image-level AUROC/FPR/TPR (metrics.py:6-25)."""
    fpr, tpr, thresholds = skm.roc_curve(
        anomaly_ground_truth_labels, anomaly_prediction_weights)
    auroc = skm.roc_auc_score(
        anomaly_ground_truth_labels, anomaly_prediction_weights)
    return {"auroc": auroc, "fpr": fpr, "tpr": tpr, "threshold": thresholds}


def compute_pixelwise_retrieval_metrics(anomaly_segmentations,
                                        ground_truth_masks) -> dict:
    """Pixel AUROC + optimal-F1-threshold FPR/FNR (metrics.py:28-76)."""
    if isinstance(anomaly_segmentations, list):
        anomaly_segmentations = np.stack(anomaly_segmentations)
    if isinstance(ground_truth_masks, list):
        ground_truth_masks = np.stack(ground_truth_masks)

    flat_scores = anomaly_segmentations.ravel()
    flat_truth = ground_truth_masks.ravel().astype(int)

    fpr, tpr, thresholds = skm.roc_curve(flat_truth, flat_scores)
    auroc = skm.roc_auc_score(flat_truth, flat_scores)

    precision, recall, pr_thresholds = skm.precision_recall_curve(
        flat_truth, flat_scores)
    f1 = np.divide(2 * precision * recall, precision + recall,
                   out=np.zeros_like(precision),
                   where=(precision + recall) != 0)
    optimal_threshold = pr_thresholds[np.argmax(f1)]
    predictions = (flat_scores >= optimal_threshold).astype(int)
    return {
        "auroc": auroc,
        "fpr": fpr,
        "tpr": tpr,
        "optimal_threshold": optimal_threshold,
        "optimal_fpr": float(np.mean(predictions > flat_truth)),
        "optimal_fnr": float(np.mean(predictions < flat_truth)),
    }
