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


def hungarian_match(preds: np.ndarray, targets: np.ndarray,
                    num_k: int) -> list[tuple[int, int]]:
    """IIC-style one-to-one cluster->class match (_hungarian_match,
    Unsupervised-Classification-master/utils/evaluate_utils.py:162-186).

    Returns [(pred_cluster, target_class), ...] maximizing vote agreement.
    """
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    num_correct = np.zeros((num_k, num_k))
    for c1 in range(num_k):
        for c2 in range(num_k):
            num_correct[c1, c2] = int(((preds == c1) & (targets == c2)).sum())
    rows, cols = linear_sum_assignment(len(targets) - num_correct)
    return list(zip(rows.tolist(), cols.tolist()))


def hungarian_evaluate(probs: np.ndarray, targets: np.ndarray,
                       compute_confusion_matrix: bool = False
                       ) -> dict[str, object]:
    """SCAN's full hungarian evaluation incl. Top-5 (hungarian_evaluate,
    Unsupervised-Classification-master/utils/evaluate_utils.py:122-159).

    Args:
        probs: [N, C] class probabilities of one subhead.
        targets: [N] int ground-truth classes.
    Returns:
        {'ACC', 'NMI', 'ARI', 'ACC Top-5', 'hungarian_match'} — ACC and
        Top-5 use match-remapped cluster ids; NMI/ARI use the raw
        predictions (both are permutation-invariant), exactly as the
        reference does.
    """
    probs = np.asarray(probs)
    targets = np.asarray(targets)
    preds = probs.argmax(axis=1)
    num_classes = len(np.unique(targets))
    match = hungarian_match(preds, targets, num_classes)

    remap = np.zeros(max(num_classes, probs.shape[1]), dtype=np.int64)
    for pred_i, target_i in match:
        remap[pred_i] = target_i
    reordered = remap[preds]
    acc = float(np.mean(reordered == targets))

    from sklearn import metrics as skm

    nmi = float(skm.normalized_mutual_info_score(targets, preds))
    ari = float(skm.adjusted_rand_score(targets, preds))

    # Top-5 over match-remapped class probabilities (evaluate_utils.py:146-151;
    # the reference topk(5) assumes >= 5 clusters — clamp for tiny setups).
    k = min(5, probs.shape[1])
    top_k = np.argsort(-probs, axis=1)[:, :k]
    reordered_top_k = remap[top_k]
    top5 = float(np.mean((reordered_top_k == targets[:, None]).any(axis=1)))

    out: dict[str, object] = {"ACC": acc, "NMI": nmi, "ARI": ari,
                              "ACC Top-5": top5, "hungarian_match": match}
    if compute_confusion_matrix:
        out["confusion_matrix"] = confusion_matrix(reordered, targets,
                                                   n_classes=num_classes)
    return out


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
