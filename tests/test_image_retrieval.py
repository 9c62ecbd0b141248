"""Revisited Oxford/Paris retrieval protocol (dino-main/eval_image_retrieval.py)."""

import numpy as np
import pytest

from tpu_ac.data.oxford_paris import (
    OxfordParisDataset,
    make_synthetic_roxford,
    revisited_splits,
)
from tpu_ac.train.evals import revisited_retrieval_eval


@pytest.fixture(scope="module")
def roxford_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("revisited")
    return make_synthetic_roxford(str(root), n_db=20, n_q=4, image_size=48)


class TestOxfordParisDataset:
    def test_splits_and_shapes(self, roxford_root):
        db = OxfordParisDataset(roxford_root, "roxford5k", "train", imsize=32)
        q = OxfordParisDataset(roxford_root, "roxford5k", "query", imsize=32)
        assert len(db) == 20 and len(q) == 4
        assert db.cfg["n"] == 20 and db.cfg["nq"] == 4
        x = db[0]
        assert x.shape == (3, 32, 32) and x.dtype == np.float32
        # normalized: not in [0, 1] anymore
        assert x.min() < 0

    def test_thumbnail_preserves_aspect(self, roxford_root, tmp_path):
        """Image.thumbnail bounds (not squashes) — a 48x48 source under a
        32 bound becomes 32x32, under a 64 bound stays 48x48."""
        ds = OxfordParisDataset(roxford_root, "roxford5k", "train", imsize=64)
        assert ds[0].shape == (3, 48, 48)

    def test_unknown_dataset_rejected(self, roxford_root):
        with pytest.raises(ValueError):
            OxfordParisDataset(roxford_root, "oxford5k", "train")


class TestRevisitedSplits:
    def test_medium_hard_construction(self):
        """Medium: ok = easy+hard, junk = junk; Hard: ok = hard,
        junk = junk+easy (eval_image_retrieval.py:182-198)."""
        gnd = [{"easy": [0, 1], "hard": [2], "junk": [3]}]
        medium, hard = revisited_splits(gnd)
        assert sorted(medium[0]["ok"].tolist()) == [0, 1, 2]
        assert medium[0]["junk"].tolist() == [3]
        assert hard[0]["ok"].tolist() == [2]
        assert sorted(hard[0]["junk"].tolist()) == [0, 1, 3]

    def test_eval_perfect_vs_inverted(self):
        """A db embedding where each query's positives are nearest scores
        mAP 1.0 on both splits; junk entries never hurt."""
        rng = np.random.default_rng(0)
        nq, ndb, d = 3, 12, 8
        q = rng.standard_normal((nq, d))
        db = rng.standard_normal((ndb, d)) * 0.01
        gnd = []
        for i in range(nq):
            pos = [4 * i, 4 * i + 1]
            db[pos[0]] = q[i] * 5.0
            db[pos[1]] = q[i] * 4.0
            gnd.append({"easy": [pos[0]], "hard": [pos[1]],
                        "junk": [4 * i + 2]})
        res = revisited_retrieval_eval(q, db, gnd)
        assert res["mAP_M"] == pytest.approx(1.0)
        assert res["mAP_H"] == pytest.approx(1.0)
        # inverted embedding ranks positives last -> far lower mAP
        res_bad = revisited_retrieval_eval(-q, db, gnd)
        assert res_bad["mAP_M"] < 0.6

    def test_easy_becomes_junk_in_hard_split(self):
        """If only the 'easy' positive ranks first, Hard-split AP must
        ignore it (junk) rather than score it."""
        q = np.asarray([[1.0, 0.0]])
        db = np.asarray([[1.0, 0.0],   # easy positive, rank 0
                         [0.9, 0.1],   # hard positive, rank 1
                         [0.0, 1.0]])
        gnd = [{"easy": [0], "hard": [1], "junk": []}]
        res = revisited_retrieval_eval(q, db, gnd)
        # hard split: easy idx 0 is junk, so the hard positive is
        # effectively at rank 0 -> AP 1.0
        assert res["mAP_H"] == pytest.approx(1.0)
        assert res["mAP_M"] == pytest.approx(1.0)


class TestRetrievalCLI:
    def test_end_to_end_synthetic(self, roxford_root):
        """Full CLI drive on the synthetic tree with a tiny ViT: queries
        are near-duplicates of their positives, so mAP should be high."""
        from tpu_ac.cli.eval_image_retrieval import main
        from tpu_ac.models.registry import BackboneSpec, register_backbone
        from tpu_ac.models.vit import ViTConfig

        register_backbone("tiny_retrieval_test", BackboneSpec(
            "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, img_size=32), None))
        res = main(["--data_path", roxford_root, "--dataset", "roxford5k",
                    "--arch", "tiny_retrieval_test", "--imsize", "48"])
        assert set(res) == {"mAP_M", "mAP_H", "mP@k_M", "mP@k_H"}
        # near-duplicate positives + random negatives: even a random-init
        # ViT embeds near-dups close, so Medium mAP is far above chance
        assert res["mAP_M"] > 0.5
        assert res["mP@k_M"].shape == (3,)

    def test_dp_matches_single(self, roxford_root):
        """--dp (shape-bucketed dp extraction over the 8-device virtual
        mesh — the reference's DistributedSampler sharding,
        eval_image_retrieval.py:112-118) reproduces the single-device
        metrics."""
        from tpu_ac.cli.eval_image_retrieval import main
        from tpu_ac.models.registry import BackboneSpec, register_backbone
        from tpu_ac.models.vit import ViTConfig

        register_backbone("tiny_retrieval_dp", BackboneSpec(
            "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, img_size=32), None))
        args = ["--data_path", roxford_root, "--dataset", "roxford5k",
                "--arch", "tiny_retrieval_dp", "--imsize", "48"]
        res1 = main(args)
        res_dp = main(args + ["--dp"])
        assert res_dp["mAP_M"] == pytest.approx(res1["mAP_M"], abs=1e-5)
        assert res_dp["mAP_H"] == pytest.approx(res1["mAP_H"], abs=1e-5)

    def test_bucketed_extraction_mixed_shapes(self):
        """The dp path groups images by shape, pads ragged groups to the
        device-count multiple, and scatters features back in dataset
        order — identical to the per-image path."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from tpu_ac.cli.eval_image_retrieval import extract_split_features

        rng = np.random.default_rng(0)

        class FakeDS:
            def __init__(self):
                # two shape buckets, both ragged vs the 8-device mesh
                self.imgs = ([rng.standard_normal((3, 16, 16)).astype(
                    np.float32) for _ in range(5)] +
                    [rng.standard_normal((3, 16, 24)).astype(np.float32)
                     for _ in range(3)])
                # interleave so scatter-back ordering is exercised
                order = [0, 5, 1, 6, 2, 7, 3, 4]
                self.imgs = [self.imgs[i] for i in order]

            def __len__(self):
                return len(self.imgs)

            def __getitem__(self, i):
                return self.imgs[i]

        def embed(p, x):
            return jnp.mean(x, axis=(2, 3)) @ p["w"]

        params = {"w": jnp.asarray(
            rng.standard_normal((3, 7)).astype(np.float32))}
        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        ds = FakeDS()
        f_dp = extract_split_features(embed, ds, mesh=mesh, params=params)
        f_1 = extract_split_features(
            lambda x: embed(params, x), ds)
        np.testing.assert_allclose(f_dp, f_1, rtol=1e-5, atol=1e-6)

    def test_streaming_flush_large_group(self):
        """A shape group larger than the 8 x n_dev buffer cap flushes in
        full-buffer chunks plus a padded tail — host memory stays bounded
        by the live buffers, and ordering survives interleaved flushes."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from tpu_ac.cli.eval_image_retrieval import extract_split_features

        rng = np.random.default_rng(1)
        n_dev = len(jax.devices())
        n_big = 8 * n_dev + 3  # one full flush + ragged tail

        class FakeDS:
            def __init__(self):
                big = [rng.standard_normal((3, 16, 16)).astype(np.float32)
                       for _ in range(n_big)]
                small = [rng.standard_normal((3, 16, 24)).astype(
                    np.float32) for _ in range(2)]
                # drop the smalls mid-stream so the big group's first
                # flush happens with the small buffer still live
                self.imgs = big[:5] + small + big[5:]

            def __len__(self):
                return len(self.imgs)

            def __getitem__(self, i):
                return self.imgs[i]

        def embed(p, x):
            return jnp.mean(x, axis=(2, 3)) @ p["w"]

        params = {"w": jnp.asarray(
            rng.standard_normal((3, 7)).astype(np.float32))}
        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        ds = FakeDS()
        f_dp = extract_split_features(embed, ds, mesh=mesh, params=params)
        f_1 = extract_split_features(lambda x: embed(params, x), ds)
        np.testing.assert_allclose(f_dp, f_1, rtol=1e-5, atol=1e-6)
