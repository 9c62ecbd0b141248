"""PatchCore detection tests, mirroring the reference's test strategy
(patchcore-inspection-main/test/{test_common,test_patchcore,test_sampler}.py):
dummy data, shape/determinism/save-load invariants — but never skip-gated
on accelerators (they run on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ac.detect import (
    ApproximateGreedyCoresetSampler,
    GreedyCoresetSampler,
    IdentitySampler,
    NearestNeighbourScorer,
    PatchCore,
    RandomSampler,
    RescaleSegmentor,
    compute_imagewise_retrieval_metrics,
    compute_pixelwise_retrieval_metrics,
)


class TestSamplers:
    """Coreset invariants (reference test_sampler.py:22-133)."""

    def test_identity(self, rng):
        f = rng.standard_normal((10, 4)).astype(np.float32)
        np.testing.assert_array_equal(IdentitySampler().run(f), f)

    def test_exact_count_and_uniqueness(self, rng):
        f = rng.standard_normal((100, 16)).astype(np.float32)
        out = GreedyCoresetSampler(0.25, seed=1).run(f)
        assert out.shape == (25, 16)
        assert len(np.unique(out, axis=0)) == 25

    def test_approximate_count(self, rng):
        f = rng.standard_normal((100, 16)).astype(np.float32)
        out = ApproximateGreedyCoresetSampler(0.3, seed=1).run(f)
        assert out.shape == (30, 16)
        assert len(np.unique(out, axis=0)) == 30

    def test_members_come_from_input(self, rng):
        f = rng.standard_normal((50, 8)).astype(np.float32)
        out = GreedyCoresetSampler(0.2, dimension_to_project_features_to=8).run(f)
        rows = {tuple(r) for r in f}
        assert all(tuple(r) in rows for r in out)

    def test_coreset_spreads(self, rng):
        """Greedy picks should cover both of two separated blobs."""
        a = rng.standard_normal((50, 8)).astype(np.float32) + 20
        b = rng.standard_normal((50, 8)).astype(np.float32) - 20
        f = np.concatenate([a, b])
        out = ApproximateGreedyCoresetSampler(
            0.1, dimension_to_project_features_to=8).run(f)
        assert (out.mean(1) > 0).any() and (out.mean(1) < 0).any()

    def test_random_sampler(self, rng):
        f = rng.standard_normal((40, 4)).astype(np.float32)
        out = RandomSampler(0.5).run(f)
        assert out.shape == (20, 4)

    def test_percentage_validation(self):
        with pytest.raises(ValueError):
            GreedyCoresetSampler(1.5)
        with pytest.raises(ValueError):
            RandomSampler(0.0)

    def test_jl_projection_keeps_original_dim(self, rng):
        f = rng.standard_normal((60, 32)).astype(np.float32)
        out = GreedyCoresetSampler(0.5, dimension_to_project_features_to=8).run(f)
        assert out.shape[1] == 32  # selection happens in 8-d, output in 32-d

    def test_select_batch_one_matches_exact(self, rng):
        """k=1 must be the exact greedy path."""
        f = rng.standard_normal((80, 16)).astype(np.float32)
        a = GreedyCoresetSampler(0.25, seed=1).run(f)
        b = GreedyCoresetSampler(0.25, seed=1, select_batch=1).run(f)
        np.testing.assert_array_equal(a, b)

    def test_select_batch_coverage_close_to_exact(self, rng):
        """Batched FPS (k picks/iteration) is an approximation; its
        coverage radius (max over points of distance to the nearest
        selected point) must stay within 2x of exact greedy's."""
        from tpu_ac.ops.distances import pairwise_sq_dists

        f = rng.standard_normal((300, 16)).astype(np.float32)

        def radius(sel):
            d2 = np.asarray(pairwise_sq_dists(jnp.asarray(f),
                                              jnp.asarray(sel)))
            return float(np.sqrt(d2.min(axis=1)).max())

        kw = dict(dimension_to_project_features_to=16, seed=3)
        exact = ApproximateGreedyCoresetSampler(0.1, **kw).run(f)
        batched = ApproximateGreedyCoresetSampler(
            0.1, select_batch=8, **kw).run(f)
        assert batched.shape == exact.shape
        assert len(np.unique(batched, axis=0)) == len(batched)
        assert radius(batched) <= 2.0 * radius(exact)

    def test_select_batch_non_divisible_count(self, rng):
        f = rng.standard_normal((100, 8)).astype(np.float32)
        out = ApproximateGreedyCoresetSampler(
            0.25, select_batch=4, dimension_to_project_features_to=8,
            seed=0).run(f)  # 25 picks, 4/iter -> 7 iters, truncated to 25
        assert out.shape == (25, 8)
        assert len(np.unique(out, axis=0)) == 25

    def test_select_batch_validation(self):
        with pytest.raises(ValueError, match="select_batch"):
            GreedyCoresetSampler(0.5, select_batch=0)

    def test_device_inputs_stay_on_device(self, rng):
        """PatchCore's device-resident fit path hands the sampler a jax
        array; the selected bank must come back as one (no host copy)."""
        f = jnp.asarray(rng.standard_normal((60, 8)).astype(np.float32))
        out = ApproximateGreedyCoresetSampler(
            0.2, dimension_to_project_features_to=8).run(f)
        assert isinstance(out, jnp.ndarray) and not isinstance(out, np.ndarray)
        assert out.shape == (12, 8)


class TestScorer:
    """FAISS-wrapper equivalents (reference test_common.py:7-64)."""

    def test_nn_search_matches_bruteforce(self, rng):
        bank = rng.standard_normal((100, 8)).astype(np.float32)
        query = rng.standard_normal((20, 8)).astype(np.float32)
        scorer = NearestNeighbourScorer(n_nearest_neighbours=3)
        scorer.fit([bank])
        scores, d2, idx = scorer.predict([query])
        # brute force squared L2
        full = ((query[:, None] - bank[None]) ** 2).sum(-1)
        want_idx = np.argsort(full, axis=1)[:, :3]
        want_d2 = np.take_along_axis(full, want_idx, axis=1)
        np.testing.assert_allclose(d2, want_d2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(scores, want_d2.mean(-1), rtol=1e-4)

    def test_unfitted_raises(self, rng):
        with pytest.raises(ValueError):
            NearestNeighbourScorer().predict(
                [rng.standard_normal((4, 8)).astype(np.float32)])

    def test_save_load_roundtrip(self, rng, tmp_path):
        bank = rng.standard_normal((50, 8)).astype(np.float32)
        query = rng.standard_normal((10, 8)).astype(np.float32)
        s1 = NearestNeighbourScorer(2)
        s1.fit([bank])
        s1.save(str(tmp_path))
        s2 = NearestNeighbourScorer(1)
        s2.load(str(tmp_path))
        a, _, _ = s1.predict([query])
        b, _, _ = s2.predict([query])
        np.testing.assert_allclose(a, b)

    def test_load_invalidates_device_bank_cache(self, rng, tmp_path):
        """A scorer that already predicted (cached its uploaded bank) must
        search the NEW bank after load(), not the stale cache."""
        bank_a = rng.standard_normal((50, 8)).astype(np.float32)
        bank_b = rng.standard_normal((40, 8)).astype(np.float32) + 5.0
        query = rng.standard_normal((10, 8)).astype(np.float32)
        other = NearestNeighbourScorer(1)
        other.fit([bank_b])
        other.save(str(tmp_path))
        want, _, _ = other.predict([query])

        s = NearestNeighbourScorer(1)
        s.fit([bank_a])
        s.predict([query])  # populates the device-bank cache with bank_a
        s.load(str(tmp_path))
        got, _, _ = s.predict([query])
        np.testing.assert_allclose(got, want)


class TestSegmentor:
    def test_shapes_and_smoothing(self, rng):
        scores = rng.uniform(size=(2, 7, 7)).astype(np.float32)
        seg = RescaleSegmentor(target_size=(56, 56))
        masks = seg.convert_to_segmentation(scores)
        assert masks.shape == (2, 56, 56)

    def test_matches_scipy_pipeline(self, rng):
        """Upsample+blur must match the reference's torch-interp + scipy path."""
        import torch
        import torch.nn.functional as F
        from scipy import ndimage

        scores = rng.uniform(size=(1, 5, 5)).astype(np.float32)
        got = RescaleSegmentor(target_size=(20, 20)).convert_to_segmentation(scores)
        t = F.interpolate(torch.from_numpy(scores).unsqueeze(1), size=(20, 20),
                          mode="bilinear", align_corners=False).squeeze(1).numpy()
        want = np.stack([ndimage.gaussian_filter(m, sigma=4.0) for m in t])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestDetectionMetrics:
    def test_imagewise_auroc_perfect(self):
        m = compute_imagewise_retrieval_metrics([0.1, 0.2, 0.9, 0.8],
                                                [0, 0, 1, 1])
        assert m["auroc"] == 1.0

    def test_pixelwise_auroc(self, rng):
        seg = rng.uniform(size=(2, 8, 8))
        truth = np.zeros((2, 8, 8))
        truth[:, :4] = 1
        seg[:, :4] += 2.0
        m = compute_pixelwise_retrieval_metrics(seg, truth)
        assert m["auroc"] == 1.0
        assert 0 <= m["optimal_fpr"] <= 1


def _pro_naive(segs, masks, fpr_limit=0.3, n_thresholds=2000):
    """Brute-force PRO: explicit threshold sweep, per-region overlap means
    (Bergmann et al. definition), trapezoid over the clipped FPR axis."""
    from scipy import ndimage

    regions = []
    for m in masks:
        labels, n = ndimage.label(m.astype(bool))
        regions.extend([(labels == r) for r in range(1, n + 1)])
    normal = ~np.stack(masks).astype(bool)
    thresholds = np.quantile(np.stack(segs).ravel(),
                             np.linspace(1, 0, n_thresholds))
    fprs, pros = [0.0], [0.0]
    for t in thresholds:
        pred = [s >= t for s in segs]
        pred_all = np.stack(pred)
        fpr = (pred_all & normal).sum() / normal.sum()
        overlaps = []
        for i, m in enumerate(masks):
            labels, n = ndimage.label(m.astype(bool))
            for r in range(1, n + 1):
                region = labels == r
                overlaps.append((pred[i] & region).sum() / region.sum())
        fprs.append(fpr)
        pros.append(np.mean(overlaps))
    fprs, pros = np.asarray(fprs), np.asarray(pros)
    pro_at = np.interp(fpr_limit, fprs, pros)
    keep = fprs < fpr_limit
    f = np.r_[fprs[keep], fpr_limit]
    p = np.r_[pros[keep], pro_at]
    return float(np.trapezoid(p, f) / fpr_limit)


class TestPRO:
    def test_matches_naive_threshold_sweep(self, rng):
        from tpu_ac.detect import compute_pro

        segs, masks = [], []
        for i in range(3):
            m = np.zeros((16, 16), bool)
            m[2:5, 2:6] = True          # region 1
            if i % 2:
                m[10:14, 9:12] = True   # region 2 on odd images
            s = rng.uniform(size=(16, 16))
            s[m] += rng.uniform(0.0, 1.5, size=int(m.sum()))
            segs.append(s)
            masks.append(m)
        got = compute_pro(segs, masks)
        want = _pro_naive(segs, masks)
        assert abs(got - want) < 2e-3, (got, want)

    def test_perfect_separation_is_one(self):
        from tpu_ac.detect import compute_pro

        m = np.zeros((2, 8, 8), bool)
        m[:, :3] = True
        s = np.where(m, 1.0, 0.0) + np.arange(128).reshape(2, 8, 8) * 1e-6
        assert compute_pro(s, m) > 0.999

    def test_constant_scores_are_chance(self):
        # one reachable operating point: everything predicted anomalous
        # (FPR=1, PRO=1); linear interpolation to the limit gives ~fpr/2
        # behavior — the score must be far below perfect
        from tpu_ac.detect import compute_pro

        m = np.zeros((1, 8, 8), bool)
        m[0, :2] = True
        s = np.ones((1, 8, 8))
        assert compute_pro(s, m) < 0.2

    def test_needs_regions_and_normals(self):
        from tpu_ac.detect import compute_pro

        with pytest.raises(ValueError, match="region"):
            compute_pro(np.ones((1, 4, 4)), np.zeros((1, 4, 4)))
        with pytest.raises(ValueError, match="normal"):
            compute_pro(np.ones((1, 4, 4)), np.ones((1, 4, 4)))


class TestPatchCoreEndToEnd:
    """Integration with a dummy embedder (reference test_patchcore.py:83-135)."""

    @staticmethod
    def _mean_pool_embedder(images):
        """A trivial patch embedder: 4x4 grid of channel means."""
        b, c, h, w = images.shape
        x = images.reshape(b, c, 4, h // 4, 4, w // 4).mean(axis=(3, 5))
        return jnp.asarray(x.transpose(0, 2, 3, 1).reshape(b, 16, c))

    def test_training_set_scores_near_zero(self, rng):
        train = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
        pc = PatchCore(self._mean_pool_embedder, target_size=(32, 32),
                       batch_size=4)
        pc.fit(train)
        scores, masks = pc.predict(train)
        assert scores.shape == (8,) and masks.shape == (8, 32, 32)
        np.testing.assert_allclose(scores, 0.0, atol=1e-6)

    def test_anomalies_score_higher(self, rng):
        train = rng.standard_normal((8, 3, 32, 32)).astype(np.float32) * 0.1
        test = rng.standard_normal((4, 3, 32, 32)).astype(np.float32) * 0.1
        test[2:] += 5.0  # anomalous
        pc = PatchCore(self._mean_pool_embedder, target_size=(32, 32),
                       batch_size=4)
        pc.fit(train)
        scores, _ = pc.predict(test)
        assert scores[2:].min() > scores[:2].max()

    def test_save_load_deterministic(self, rng, tmp_path):
        train = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
        test = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
        pc = PatchCore(self._mean_pool_embedder, target_size=(32, 32),
                       batch_size=4, config={"backbone": "dummy"})
        pc.fit(train)
        s1, m1 = pc.predict(test)
        pc.save_to_path(str(tmp_path))

        pc2 = PatchCore(self._mean_pool_embedder, target_size=(32, 32),
                        batch_size=4)
        pc2.load_from_path(str(tmp_path))
        s2, m2 = pc2.predict(test)
        np.testing.assert_allclose(s1, s2)
        np.testing.assert_allclose(m1, m2)
        assert pc2.config == {"backbone": "dummy"}

    def test_with_coreset(self, rng):
        train = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
        pc = PatchCore(self._mean_pool_embedder,
                       featuresampler=ApproximateGreedyCoresetSampler(
                           0.5, dimension_to_project_features_to=3),
                       target_size=(32, 32), batch_size=4)
        pc.fit(train)
        assert pc.anomaly_scorer.detection_features.shape == (64, 3)


class TestApproximateIndex:
    def test_high_recall_vs_exact(self, rng):
        from tpu_ac.detect import IVFFlatIndex

        bank = rng.standard_normal((500, 16)).astype(np.float32)
        query = rng.standard_normal((40, 16)).astype(np.float32)
        idx = IVFFlatIndex(n_lists=16, n_probe=8)
        idx.fit(bank)
        d2, ids = idx.search(query, k=5)
        full = ((query[:, None] - bank[None]) ** 2).sum(-1)
        exact_ids = np.argsort(full, axis=1)[:, :5]
        recall = np.mean([
            len(set(ids[i]) & set(exact_ids[i])) / 5
            for i in range(len(query))])
        assert recall >= 0.8  # nprobe=8/16 probes half the cells

    def test_full_probe_is_exact(self, rng):
        from tpu_ac.detect import IVFFlatIndex

        bank = rng.standard_normal((100, 8)).astype(np.float32)
        query = rng.standard_normal((10, 8)).astype(np.float32)
        idx = IVFFlatIndex(n_lists=4, n_probe=4)
        idx.fit(bank)
        _, ids = idx.search(query, k=3)
        full = ((query[:, None] - bank[None]) ** 2).sum(-1)
        exact = np.argsort(full, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(ids, 1), np.sort(exact, 1))

    def test_scorer_in_patchcore(self, rng):
        from tpu_ac.detect.approx import ApproximateNearestNeighbourScorer

        bank = rng.standard_normal((200, 8)).astype(np.float32)
        scorer = ApproximateNearestNeighbourScorer(
            n_nearest_neighbours=2, n_lists=8, n_probe=8)
        scorer.fit([bank])
        scores, d2, idx = scorer.predict([bank[:10]])
        # self-queries with full probing find themselves: min distance ~0
        assert d2[:, 0].max() < 1e-6

    def test_kmeans_converges(self, rng):
        import jax.numpy as jnp
        from tpu_ac.detect import kmeans

        a = rng.standard_normal((50, 4)).astype(np.float32) + 10
        b = rng.standard_normal((50, 4)).astype(np.float32) - 10
        cents, assign = kmeans(jnp.asarray(np.concatenate([a, b])), 2)
        assign = np.asarray(assign)
        assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
        assert assign[0] != assign[50]


class TestIVFPQ:
    """ApproximateFaissNN = IndexIVFPQ semantics (common.py:100-126)."""

    @staticmethod
    def _clustered_bank(rng, n=600, d=32, n_modes=12):
        modes = rng.standard_normal((n_modes, d)).astype(np.float32) * 8
        pick = rng.integers(0, n_modes, n)
        return (modes[pick]
                + rng.standard_normal((n, d)).astype(np.float32) * 0.3)

    def test_recall_at_1_vs_exact(self, rng):
        from tpu_ac.detect.approx import IVFPQIndex

        bank = self._clustered_bank(rng)
        query = bank[:64] + 0.01  # near-duplicates of stored vectors
        idx = IVFPQIndex(n_lists=16, n_probe=8, code_size=8, n_bits=6)
        idx.fit(bank)
        _, ids = idx.search(query, k=1)
        exact = np.argmin(((query[:, None] - bank[None]) ** 2).sum(-1),
                          axis=1)
        recall = float(np.mean(ids[:, 0] == exact))
        assert recall >= 0.9, f"recall@1 {recall}"

    def test_memory_compression(self, rng):
        from tpu_ac.detect.approx import IVFPQIndex

        bank = self._clustered_bank(rng, n=400, d=64)
        idx = IVFPQIndex(n_lists=8, n_probe=8, code_size=8, n_bits=8)
        idx.fit(bank)
        # stored codes: 8 bytes/vector vs 256 bytes/vector raw f32
        # (padding inflates by the cell-imbalance factor, still << raw)
        assert idx.code_bytes < bank.nbytes / 8

    def test_adc_distances_close_to_exact(self, rng):
        from tpu_ac.detect.approx import IVFPQIndex

        bank = self._clustered_bank(rng)
        query = self._clustered_bank(rng, n=32)
        idx = IVFPQIndex(n_lists=8, n_probe=8, code_size=16, n_bits=8)
        idx.fit(bank)
        d2, ids = idx.search(query, k=1)
        true_d2 = ((query - bank[ids[:, 0]]) ** 2).sum(-1)
        # ADC distance = distance to the quantized vector: close, not exact
        np.testing.assert_allclose(d2[:, 0], true_d2, rtol=0.25, atol=1.0)

    def test_dim_padding(self, rng):
        from tpu_ac.detect.approx import IVFPQIndex

        bank = self._clustered_bank(rng, n=200, d=30)  # 30 % 8 != 0
        idx = IVFPQIndex(n_lists=4, n_probe=4, code_size=8, n_bits=6)
        idx.fit(bank)
        d2, ids = idx.search(bank[:10] + 0.01, k=1)
        assert (ids[:, 0] == np.arange(10)).mean() >= 0.9

    def test_scorer_save_load_roundtrip(self, rng, tmp_path):
        from tpu_ac.detect.approx import ApproximateNearestNeighbourScorer

        bank = self._clustered_bank(rng, n=300)
        q = self._clustered_bank(rng, n=20)
        for method in ("ivfpq", "ivfflat"):
            scorer = ApproximateNearestNeighbourScorer(
                n_nearest_neighbours=2, n_lists=8, n_probe=4, method=method,
                code_size=8)
            scorer.fit([bank])
            s1, d1, i1 = scorer.predict([q])
            scorer.save(str(tmp_path), prepend=method)
            fresh = ApproximateNearestNeighbourScorer(method=method)
            fresh.load(str(tmp_path), prepend=method)
            s2, d2, i2 = fresh.predict([q])
            np.testing.assert_allclose(s1, s2, rtol=1e-6)
            np.testing.assert_array_equal(i1, i2)

    def test_patchcore_with_ivfpq(self, rng):
        train = rng.standard_normal((8, 3, 32, 32)).astype(np.float32) * 0.1
        test = rng.standard_normal((4, 3, 32, 32)).astype(np.float32) * 0.1
        test[2:] += 5.0
        pc = PatchCore(TestPatchCoreEndToEnd._mean_pool_embedder,
                       target_size=(32, 32), batch_size=4,
                       nn_method="ivfpq")
        pc.fit(train)
        scores, masks = pc.predict(test)
        assert scores.shape == (4,) and masks.shape == (4, 32, 32)
        assert scores[2:].min() > scores[:2].max()
