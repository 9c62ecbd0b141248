"""bf16 evidence on REAL data: quantizing the reference's golden X to
bfloat16 must leave the published CSV clustering metrics unchanged.

The bf16 fast path was validated on synthetic data (test_bf16_realistic);
this is the missing real-data leg (VERDICT r3 item 7): the reference's own
checked-in embeddings (13 categories x 2 modes of
outputs/mvtec_ad/dino_vitbase8/...matrix_alpha_X_<cat>_<mode>.pickle) are
round-tripped through bfloat16 and pushed through OUR clustering + metrics
stack; the NMI/ARI/F1 must still equal the reference's published CSV rows
to 1e-6 — i.e. the clustering stage is insensitive to bf16 storage of real
flagship-scale embeddings, which is the evidence backing the bfloat16
default precision (PARITY.md "precision defaults").
"""

import os

import numpy as np
import pytest

from tests.conftest import GOLDEN_ROOT
from tests.test_golden_parity import (
    _CATEGORIES,
    _PARAMS,
    _golden_csv_rows,
    _load_info_labels,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_ROOT), reason="reference goldens not mounted")


def _evaluate_bf16(category: str, mode: str) -> dict[str, float]:
    import ml_dtypes

    from tpu_ac.cluster.metrics import (
        agglomerative_cluster,
        clustering_scores,
        encode_labels,
    )
    from tpu_ac.pipeline import load_alpha_X

    path = os.path.join(GOLDEN_ROOT, "dino_vitbase8", mode, _PARAMS,
                        f"matrix_alpha_X_{category}_{mode}.pickle")
    _alpha, X = load_alpha_X(path)
    X = X.astype(ml_dtypes.bfloat16).astype(np.float32)  # bf16 round-trip
    labels_str = _load_info_labels(category)
    keep = [i for i, a in enumerate(labels_str) if a != "combined"]
    X = X[keep]
    labels = encode_labels([labels_str[i] for i in keep])
    preds = agglomerative_cluster(X, n_clusters=len(set(labels.tolist())))
    return clustering_scores(labels, preds)


@pytest.mark.parametrize("mode", ["unsupervised", "supervised"])
@pytest.mark.parametrize("category", _CATEGORIES)
def test_golden_csv_parity_with_bf16_quantized_X(mode, category):
    want = _golden_csv_rows(mode).get(category)
    if want is None:
        pytest.skip(f"no golden row for {category}/{mode}")
    got = _evaluate_bf16(category, mode)
    assert got["NMI"] == pytest.approx(want[0], abs=1e-6), (category, mode)
    assert got["ARI"] == pytest.approx(want[1], abs=1e-6), (category, mode)
    assert got["F1"] == pytest.approx(want[2], abs=1e-6), (category, mode)
