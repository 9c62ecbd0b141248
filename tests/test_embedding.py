"""Embedding pipeline + alpha math parity vs the torch oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ac.models import ViTConfig, init_vit_params
from tpu_ac.features import EmbedConfig, embed_vit_features, build_embedder
from tpu_ac.cluster import (
    matrix_alpha_unsupervised,
    matrix_alpha_supervised,
    matrix_alpha_average,
    weighted_embedding,
)
from tests.torch_ref import (
    torch_vit_blocks,
    torch_embed_pipeline,
    torch_alpha_unsupervised,
    torch_alpha_supervised,
)

TINY = ViTConfig(patch_size=8, embed_dim=64, depth=4, num_heads=4, img_size=32)
ECFG = EmbedConfig(layers=("blocks.2", "blocks.3"),
                   pretrain_embed_dimension=96,
                   target_embed_dimension=192)


@pytest.fixture(scope="module")
def tiny_params():
    return init_vit_params(0, TINY)


class TestEmbedding:
    def test_matches_torch_pipeline(self, tiny_params, rng):
        imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        got = np.asarray(
            embed_vit_features(tiny_params, jnp.asarray(imgs), TINY, ECFG))
        blocks = torch_vit_blocks(tiny_params, imgs, TINY, ECFG.tap_indices)
        want = torch_embed_pipeline(
            [blocks[t] for t in ECFG.tap_indices],
            ECFG.pretrain_embed_dimension, ECFG.target_embed_dimension,
            ECFG.patchsize)
        assert got.shape == want.shape == (2, 16, 192)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)

    def test_jitted_embedder_deterministic(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
        embed = build_embedder(tiny_params, TINY, ECFG)
        a = np.asarray(embed(imgs))
        b = np.asarray(embed(imgs))
        np.testing.assert_array_equal(a, b)

    def test_multiscale_alignment(self, tiny_params, rng):
        """Layers with different grids are bilinearly aligned to the first."""
        from tpu_ac.features.embedding import _align_patches
        import torch
        import torch.nn.functional as F

        x = rng.standard_normal((1, 4 * 4, 6, 3, 3)).astype(np.float32)
        got = np.asarray(_align_patches(jnp.asarray(x), (4, 4), (8, 8)))
        # torch path per reference patchcore.py:398-421
        xt = torch.from_numpy(x).reshape(1, 4, 4, 6, 3, 3)
        xt = xt.permute(0, 3, 4, 5, 1, 2)
        shp = xt.shape
        xt = xt.reshape(-1, 4, 4)
        xt = F.interpolate(xt.unsqueeze(1), size=(8, 8), mode="bilinear",
                           align_corners=False).squeeze(1)
        xt = xt.reshape(*shp[:-2], 8, 8).permute(0, 4, 5, 1, 2, 3)
        want = xt.reshape(1, 64, 6, 3, 3).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestAlpha:
    def test_unsupervised_matches_reference_loop(self, rng):
        Z = rng.standard_normal((6, 10, 8)).astype(np.float32)
        for tau in (0.0, 0.5, 1.0, 4.0):
            got = np.asarray(matrix_alpha_unsupervised(tau, 1.0, jnp.asarray(Z)))
            want = torch_alpha_unsupervised(Z, tau)
            np.testing.assert_allclose(got, want, rtol=8e-4, atol=1e-6)

    def test_supervised_matches_reference_loop(self, rng):
        Z = rng.standard_normal((5, 10, 8)).astype(np.float32)
        Ztr = rng.standard_normal((4, 10, 8)).astype(np.float32)
        for tau in (0.0, 1.0, 2.5):
            got = np.asarray(
                matrix_alpha_supervised(tau, 1.0, jnp.asarray(Z), jnp.asarray(Ztr)))
            want = torch_alpha_supervised(Z, Ztr, tau)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)

    def test_rows_sum_to_one(self, rng):
        Z = jnp.asarray(rng.standard_normal((4, 6, 5)).astype(np.float32))
        a = matrix_alpha_unsupervised(1.0, 1.0, Z)
        np.testing.assert_allclose(np.asarray(a).sum(axis=1), 1.0, rtol=1e-5)

    def test_average_mode(self, rng):
        Z = jnp.asarray(rng.standard_normal((3, 7, 4)).astype(np.float32))
        a = matrix_alpha_average(Z)
        np.testing.assert_allclose(np.asarray(a), 1.0 / 7)

    def test_weighted_embedding_is_bmm(self, rng):
        Z = rng.standard_normal((3, 7, 4)).astype(np.float32)
        a = rng.uniform(size=(3, 7)).astype(np.float32)
        got = np.asarray(weighted_embedding(jnp.asarray(a), jnp.asarray(Z)))
        want = np.einsum("np,npd->nd", a, Z)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestClusterMetrics:
    def test_best_map_identity(self):
        from tpu_ac.cluster import best_map
        labels = np.array([0, 0, 1, 1, 2, 2])
        preds = np.array([2, 2, 0, 0, 1, 1])
        np.testing.assert_array_equal(best_map(labels, preds), labels)

    def test_best_map_matches_munkres_semantics(self, rng):
        from tpu_ac.cluster import best_map
        labels = rng.integers(0, 4, size=50)
        preds = rng.integers(0, 4, size=50)
        remapped = best_map(labels, preds)
        # Remapping never decreases accuracy vs any fixed permutation
        base = np.mean(labels == preds)
        assert np.mean(labels == remapped) >= base

    def test_clustering_scores_perfect(self):
        from tpu_ac.cluster import clustering_scores
        labels = np.array([0, 0, 1, 1, 2, 2])
        preds = np.array([1, 1, 2, 2, 0, 0])
        s = clustering_scores(labels, preds)
        assert s["NMI"] == pytest.approx(1.0)
        assert s["ARI"] == pytest.approx(1.0)
        assert s["F1"] == pytest.approx(1.0)

    def test_agglomerative_separable(self, rng):
        from tpu_ac.cluster import agglomerative_cluster, clustering_scores
        a = rng.standard_normal((20, 8)) + 10
        b = rng.standard_normal((20, 8)) - 10
        X = np.concatenate([a, b])
        labels = np.array([0] * 20 + [1] * 20)
        preds = agglomerative_cluster(X, 2)
        assert clustering_scores(labels, preds)["F1"] == 1.0

    def test_encode_labels(self):
        from tpu_ac.cluster import encode_labels
        out = encode_labels(["crack", "bent", "crack", "hole"])
        np.testing.assert_array_equal(out, [1, 0, 1, 2])


class TestBucketedAlpha:
    def test_padded_unsupervised_matches_exact(self, rng):
        from tpu_ac.cluster.alpha import weight_distance_unsupervised
        Z = rng.standard_normal((6, 10, 8)).astype(np.float32)
        want = np.asarray(weight_distance_unsupervised(jnp.asarray(Z)))
        zp = np.concatenate([Z, np.zeros((2, 10, 8), np.float32)])
        got = np.asarray(weight_distance_unsupervised(
            jnp.asarray(zp), n_valid=6))[:6]
        # padded-shape matmuls reorder f32 reductions -> ~1e-4 rel noise
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)

    def test_padded_supervised_matches_exact(self, rng):
        from tpu_ac.cluster.alpha import weight_distance_supervised
        Z = rng.standard_normal((5, 10, 8)).astype(np.float32)
        Ztr = rng.standard_normal((3, 10, 8)).astype(np.float32)
        want = np.asarray(weight_distance_supervised(jnp.asarray(Z),
                                                     jnp.asarray(Ztr)))
        ztp = np.concatenate([Ztr, np.zeros((5, 10, 8), np.float32)])
        got = np.asarray(weight_distance_supervised(
            jnp.asarray(Z), jnp.asarray(ztp), n_train_valid=3))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_compute_alpha_x_bucketed(self, rng):
        from tpu_ac.pipeline import compute_alpha_X
        Z = jnp.asarray(rng.standard_normal((7, 10, 8)).astype(np.float32))
        a1, x1 = compute_alpha_X(Z, "unsupervised", 1.0, n_bucket=4)
        a2, x2 = compute_alpha_X(Z, "unsupervised", 1.0, n_bucket=1)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-7)
        assert a1.shape == (7, 10) and x1.shape == (7, 8)
