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


def compute_pro(anomaly_segmentations, ground_truth_masks,
                fpr_limit: float = 0.3) -> float:
    """Per-Region-Overlap AUC up to ``fpr_limit``, normalized to [0, 1].

    The PRO score of Bergmann et al. (the number the reference's README
    quotes — e.g. patchcore-inspection-main/README.md:190 "PRO 94.4%" —
    but whose code never computes; run_patchcore.py:181 only carries it
    as a comment). For each threshold, the overlap of the binarized
    prediction with EVERY connected anomaly region is averaged (so small
    defects count as much as large ones), plotted against the
    false-positive rate on normal pixels, and integrated up to
    ``fpr_limit`` (0.3 in the paper), normalized by that limit.

    Exact O(N log N) computation: every pixel of region r contributes
    1/(n_regions * |r|) to the mean region overlap the moment the
    threshold passes its score, so both curves are cumulative sums over
    the pixels sorted by score descending; ties are collapsed to one
    curve point (a threshold set cannot split equal scores).
    """
    from scipy import ndimage

    if isinstance(anomaly_segmentations, list):
        anomaly_segmentations = np.stack(anomaly_segmentations)
    if isinstance(ground_truth_masks, list):
        ground_truth_masks = np.stack(ground_truth_masks)
    masks = ground_truth_masks.astype(bool)

    # per-pixel weight: 1/(n_regions_total * |region(pixel)|), 0 for normal
    weights = np.zeros(anomaly_segmentations.shape, np.float64)
    n_regions = 0
    for i in range(masks.shape[0]):
        labels, n = ndimage.label(masks[i])
        for r in range(1, n + 1):
            region = labels == r
            weights[i][region] = 1.0 / region.sum()
        n_regions += n
    if n_regions == 0:
        raise ValueError("compute_pro needs at least one anomaly region")
    weights /= n_regions

    scores = anomaly_segmentations.ravel()
    weights = weights.ravel()
    normal = ~masks.ravel()
    n_normal = int(normal.sum())
    if n_normal == 0:
        raise ValueError("compute_pro needs normal pixels for the FPR axis")

    order = np.argsort(-scores, kind="stable")
    pro_curve = np.cumsum(weights[order])
    fpr_curve = np.cumsum(normal[order]) / n_normal
    # collapse ties: only the LAST index of each equal-score run is a
    # reachable operating point
    s_sorted = scores[order]
    last_of_run = np.r_[s_sorted[1:] != s_sorted[:-1], True]
    pro_curve = pro_curve[last_of_run]
    fpr_curve = fpr_curve[last_of_run]

    # prepend the (0, 0) operating point, clip at fpr_limit by linear
    # interpolation of the PRO value there, then trapezoid-integrate
    fpr = np.r_[0.0, fpr_curve]
    pro = np.r_[0.0, pro_curve]
    keep = fpr < fpr_limit
    pro_at_limit = np.interp(fpr_limit, fpr, pro)
    fpr = np.r_[fpr[keep], fpr_limit]
    pro = np.r_[pro[keep], pro_at_limit]
    return float(np.trapezoid(pro, fpr) / fpr_limit)
