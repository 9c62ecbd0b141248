"""Native C++ host kernels vs scipy/numpy references."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from tpu_ac import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


class TestHungarian:
    def test_matches_scipy(self, lib, rng):
        for n in (2, 5, 20, 64):
            cost = rng.uniform(size=(n, n))
            assignment, total = native.hungarian(cost)
            rows, cols = linear_sum_assignment(cost)
            want_total = cost[rows, cols].sum()
            assert total == pytest.approx(want_total, rel=1e-10)
            assert sorted(assignment.tolist()) == list(range(n))
            # optimal assignments may differ on ties; totals must match
            got_total = cost[np.arange(n), assignment].sum()
            assert got_total == pytest.approx(want_total, rel=1e-10)

    def test_identity_case(self, lib):
        cost = 1.0 - np.eye(4)
        assignment, total = native.hungarian(cost)
        np.testing.assert_array_equal(assignment, np.arange(4))
        assert total == 0.0


class TestNativeKnn:
    def test_matches_bruteforce(self, lib, rng):
        q = rng.standard_normal((17, 24)).astype(np.float32)
        bank = rng.standard_normal((101, 24)).astype(np.float32)
        d2, idx = native.knn_l2(q, bank, k=5)
        full = ((q[:, None] - bank[None]) ** 2).sum(-1)
        want_idx = np.argsort(full, axis=1)[:, :5]
        np.testing.assert_array_equal(idx, want_idx)
        np.testing.assert_allclose(
            d2, np.take_along_axis(full, want_idx, 1), rtol=1e-4, atol=1e-4)

    def test_k_clamped_to_n(self, lib, rng):
        q = rng.standard_normal((3, 4)).astype(np.float32)
        bank = rng.standard_normal((2, 4)).astype(np.float32)
        d2, idx = native.knn_l2(q, bank, k=10)
        assert d2.shape == (3, 2)


class TestNativeCoreset:
    def test_matches_python_greedy(self, lib, rng):
        feats = rng.standard_normal((50, 8)).astype(np.float32)
        anchor = np.linalg.norm(
            np.sqrt(((feats[:, None] - feats[None]) ** 2).sum(-1)), axis=1
        ).astype(np.float32)
        got = native.greedy_coreset(feats, anchor, 10)
        # python reference
        a = anchor.copy()
        want = []
        for _ in range(10):
            b = int(np.argmax(a))
            want.append(b)
            a = np.minimum(a, np.sqrt(((feats - feats[b]) ** 2).sum(-1)))
        np.testing.assert_array_equal(got, want)


class TestBestMapUsesNative:
    def test_native_and_scipy_assignments_agree(self, rng):
        """The native JV solver and scipy must produce assignments of the
        SAME total cost on the best_map contingency problem (assignments
        may differ on ties; the remapped accuracy is tie-invariant)."""
        from scipy.optimize import linear_sum_assignment

        from tpu_ac.cluster.metrics import contingency, hungarian_accuracy
        from tpu_ac.native import hungarian

        # hermetic rng: the scipy-vs-native comparison must not depend
        # on the shared session stream's position
        rng_ = np.random.default_rng(17)
        labels = np.asarray(rng_.integers(0, 5, 100))
        preds = np.asarray(rng_.integers(0, 5, 100))
        g = contingency(labels, preds)
        assignment, native_cost = hungarian(-g.T.astype(np.float64))
        r, c = linear_sum_assignment(-g.T)
        scipy_cost = float((-g.T)[r, c].sum())
        assert native_cost == pytest.approx(scipy_cost)
        # accuracy computed through best_map (whichever backend) matches
        # a scipy-only recomputation
        acc = hungarian_accuracy(labels, preds)
        mapping = dict(zip(r, c))
        remapped = np.asarray([mapping.get(p_, p_) for p_ in preds])
        assert acc == pytest.approx(float(np.mean(remapped == labels)))
