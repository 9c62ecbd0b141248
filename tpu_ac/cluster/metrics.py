"""Host-side clustering + metrics (examples/test.py:109-226 equivalents).

Agglomerative clustering, Hungarian relabeling, and NMI/ARI/F1 all run on
tiny [N<=~170] arrays — these stay on the host (sklearn/scipy), exactly as
SURVEY.md section 2.4 plans.  ``best_map`` replaces the reference's munkres
dependency with scipy's linear_sum_assignment (identical optimal matching on
the same -G^T cost).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def contingency(labels: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """Square contingency matrix G[i, j] = |labels==L1[i] & preds==L2[j]|.

    Mirrors examples/test.py:111-123 (classes sorted ascending, padded to
    max(#label classes, #pred classes)).
    """
    l1 = np.unique(labels)
    l2 = np.unique(preds)
    n = max(len(l1), len(l2))
    g = np.zeros((n, n), dtype=np.float64)
    for i, a in enumerate(l1):
        for j, b in enumerate(l2):
            g[i, j] = np.sum((labels == a) & (preds == b))
    return g


def best_map(labels: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """Relabel cluster ids to maximize agreement (examples/test.py:109-131).

    Hungarian assignment on -G^T; returns preds mapped into label space.
    """
    labels = np.asarray(labels)
    preds = np.asarray(preds)
    g = contingency(labels, preds)
    try:  # native O(n^3) JV solver (tpu_ac/native.py); scipy fallback
        from tpu_ac.native import hungarian

        assignment, _ = hungarian(-g.T)
        rows = np.arange(len(assignment))
        cols = assignment
    except Exception:  # noqa: BLE001
        rows, cols = linear_sum_assignment(-g.T)
    l1 = np.unique(labels)
    l2 = np.unique(preds)
    # Pad label values in case there are more clusters than label classes
    # (the reference indexes Label1[c[i]] which assumes enough classes).
    pad = [v for v in range(len(l2)) if v not in set(l1)]
    l1_padded = np.concatenate([l1, np.asarray(pad, dtype=l1.dtype)]) if pad else l1
    mapping = {row: l1_padded[col] for row, col in zip(rows, cols)}
    out = np.zeros(preds.shape, dtype=labels.dtype)
    for j, b in enumerate(l2):
        out[preds == b] = mapping[j]
    return out


def hungarian_accuracy(labels: np.ndarray, preds: np.ndarray) -> float:
    """Clustering accuracy after optimal relabeling (SCAN's hungarian eval,
    Unsupervised-Classification-master/utils/evaluate_utils.py:122-186)."""
    remapped = best_map(np.asarray(labels), np.asarray(preds))
    return float(np.mean(remapped == np.asarray(labels)))


def clustering_scores(labels: np.ndarray, preds: np.ndarray) -> dict[str, float]:
    """NMI / ARI / micro-F1 of best-mapped predictions (test.py:196,218-220)."""
    from sklearn import metrics as skm

    labels = np.asarray(labels)
    preds = best_map(labels, np.asarray(preds)).astype(int)
    return {
        "NMI": float(skm.normalized_mutual_info_score(labels, preds)),
        "ARI": float(skm.adjusted_rand_score(labels, preds)),
        "F1": float(skm.f1_score(labels, preds, average="micro")),
    }


def agglomerative_cluster(X: np.ndarray, n_clusters: int) -> np.ndarray:
    """sklearn AgglomerativeClustering(ward), as the reference (test.py:193-195)."""
    from sklearn import cluster as skc

    model = skc.AgglomerativeClustering(n_clusters=n_clusters)
    return model.fit_predict(np.asarray(X))


def encode_labels(label_strings: list[str]) -> np.ndarray:
    """LabelEncoder equivalent (test.py:190-191): sorted-unique string -> int."""
    classes = sorted(set(label_strings))
    lut = {c: i for i, c in enumerate(classes)}
    return np.asarray([lut[s] for s in label_strings], dtype=int)


def confusion_matrix(preds, labels, n_classes: int | None = None
                     ) -> np.ndarray:
    """[n_classes, n_classes] counts, rows = true, cols = predicted
    (Unsupervised-Classification-master/utils/utils.py:73-83)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if n_classes is None:
        n_classes = int(max(preds.max(), labels.max())) + 1
    m = np.zeros((n_classes, n_classes), dtype=np.int64)
    for t, p in zip(labels, preds):
        m[int(t), int(p)] += 1
    return m
