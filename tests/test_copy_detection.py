"""Copydays copy-detection protocol (dino-main/eval_copy_detection.py)."""

import os

import numpy as np
import pytest

from tpu_ac.train.copy_detection import (
    JPEG_LEVELS,
    CROP_LEVELS,
    CopydaysDataset,
    copydays_eval,
    gem_cls_features,
)


@pytest.fixture(scope="module")
def copydays_root(tmp_path_factory):
    """Synthetic Copydays tree: 4 originals; every transformed block is a
    noised copy (1:1 ground truth); 'strong' has 2 images whose 4-char
    filename prefixes match originals 0 and 2."""
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("copydays")
    bases = [rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
             for _ in range(4)]
    names = ["2000.jpg", "2001.jpg", "2002.jpg", "2003.jpg"]

    def save(block, fnames, arrays):
        d = root / block
        d.mkdir(parents=True, exist_ok=True)
        for fname, arr in zip(fnames, arrays):
            Image.fromarray(arr).save(d / fname)

    def noised(scale):
        return [np.clip(b.astype(int)
                        + rng.integers(-scale, scale, b.shape), 0,
                        255).astype(np.uint8) for b in bases]

    save("original", names, bases)
    save("strong", ["2000_strong.jpg", "2002_strong.jpg"],
         [noised(30)[0], noised(30)[2]])
    for lvl in JPEG_LEVELS:
        save(f"jpegqual/{lvl}", names, noised(10))
    for lvl in CROP_LEVELS:
        save(f"crops/{lvl}", names, noised(10))
    return str(root)


class TestCopydaysDataset:
    def test_block_layout(self, copydays_root):
        ds = CopydaysDataset(copydays_root)
        assert len(ds.block_names) == 2 + 9 + 9
        paths, sizes = ds.query_paths()
        assert sizes[0] == 4 and sizes[1] == 2
        assert len(paths) == sum(sizes)
        assert len(ds.database_paths()) == 4

    def test_eval_result_perfect_ranking(self, copydays_root):
        ds = CopydaysDataset(copydays_root)
        _, sizes = ds.query_paths()
        rows = []
        for bi, sz in enumerate(sizes):
            if ds.block_names[bi] == "strong":
                rows += [[0, 1, 2, 3], [2, 0, 1, 3]]  # prefix gnd: 0 and 2
            else:
                rows += [[q, (q + 1) % 4, (q + 2) % 4, (q + 3) % 4]
                         for q in range(sz)]
        res = ds.eval_result(np.asarray(rows), sizes)
        assert all(v == pytest.approx(1.0) for v in res.values()), res

    def test_eval_result_rank_penalty(self, copydays_root):
        ds = CopydaysDataset(copydays_root)
        _, sizes = ds.query_paths()
        rows = []
        for bi, sz in enumerate(sizes):
            if ds.block_names[bi] == "strong":
                rows += [[0, 1, 2, 3], [2, 0, 1, 3]]
            else:
                # true match at rank 1 -> trapezoid AP = (0 + 1/2)/2 = 0.25
                # (score_ap_from_ranks_1, eval_copy_detection.py:97-125)
                rows += [[(q + 1) % 4, q, (q + 2) % 4, (q + 3) % 4]
                         for q in range(sz)]
        res = ds.eval_result(np.asarray(rows), sizes)
        assert res["original"] == pytest.approx(0.25)
        assert res["jpegqual/3"] == pytest.approx(0.25)
        assert res["strong"] == pytest.approx(1.0)


class TestCopydaysEval:
    def test_identity_features_perfect_map(self, copydays_root):
        ds = CopydaysDataset(copydays_root)
        _, sizes = ds.query_paths()
        rng = np.random.default_rng(1)
        db = rng.standard_normal((4, 16)).astype(np.float32)
        # queries = near-copies of their ground-truth database row
        rows = []
        for bi, sz in enumerate(sizes):
            if ds.block_names[bi] == "strong":
                rows += [db[0], db[2]]
            else:
                rows += [db[q] for q in range(sz)]
        q = np.stack(rows) + 0.01 * rng.standard_normal(
            (sum(sizes), 16)).astype(np.float32)
        res = copydays_eval(q, db, ds, sizes)
        assert all(v == pytest.approx(1.0, abs=1e-6)
                   for v in res.values()), res

    def test_distractors_extend_database(self, copydays_root):
        ds = CopydaysDataset(copydays_root)
        _, sizes = ds.query_paths()
        rng = np.random.default_rng(2)
        db = rng.standard_normal((4, 16)).astype(np.float32)
        rows = []
        for bi, sz in enumerate(sizes):
            picks = [0, 2] if ds.block_names[bi] == "strong" else range(sz)
            rows += [db[q] for q in picks]
        q = np.stack(rows).astype(np.float32)
        distract = rng.standard_normal((50, 16)).astype(np.float32) * 5
        res = copydays_eval(q, db, ds, sizes, distractor_features=distract)
        assert res["original"] == pytest.approx(1.0, abs=1e-6)

    def test_whitening_path_runs(self, copydays_root):
        ds = CopydaysDataset(copydays_root)
        _, sizes = ds.query_paths()
        rng = np.random.default_rng(3)
        db = rng.standard_normal((4, 16)).astype(np.float32)
        rows = []
        for bi, sz in enumerate(sizes):
            picks = [0, 2] if ds.block_names[bi] == "strong" else range(sz)
            rows += [db[q] for q in picks]
        q = (np.stack(rows)
             + 0.001 * rng.standard_normal((sum(sizes), 16))).astype(
                 np.float32)
        whit = rng.standard_normal((64, 16)).astype(np.float32)
        res = copydays_eval(q, db, ds, sizes, whitening_features=whit)
        assert res["original"] >= 0.99


class TestGeMFeatures:
    def test_shapes_and_gem_math(self, rng):
        import jax.numpy as jnp

        toks = jnp.asarray(
            np.abs(rng.standard_normal((2, 5, 8))).astype(np.float32))
        out = np.asarray(gem_cls_features(toks, p=4.0))
        assert out.shape == (2, 16)
        np.testing.assert_allclose(out[:, :8], np.asarray(toks[:, 0, :]))
        want = (np.mean(np.asarray(toks[:, 1:, :]) ** 4, axis=1)) ** 0.25
        np.testing.assert_allclose(out[:, 8:], want, rtol=1e-5)


class TestCopyDetectionCLI:
    def test_cli_end_to_end(self, copydays_root, tmp_path):
        from tpu_ac.cli.eval_copy_detection import main
        from tpu_ac.models.registry import register_backbone, BackboneSpec
        from tpu_ac.models.vit import ViTConfig

        register_backbone("tiny_test_cd", BackboneSpec(
            "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, img_size=32), None))
        # distractors dir
        from PIL import Image

        d = tmp_path / "distractors"
        d.mkdir()
        rng = np.random.default_rng(5)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(
                np.uint8)).save(d / f"d{i}.png")
        res = main(["--data_path", copydays_root, "--arch", "tiny_test_cd",
                    "--imsize", "32", "--batch_size_per_gpu", "8",
                    "--distractors_path", str(d)])
        assert set(res) == set(CopydaysDataset(copydays_root).block_names)
        # noised near-copies with a real (random-weight) ViT still retrieve
        # their original nearly perfectly
        assert res["jpegqual/75"] > 0.8

    def test_cli_dp_matches_single(self, copydays_root):
        """--dp (dp-sharded extraction batches over the 8-device virtual
        mesh — the reference's DistributedSampler + cross-rank all_gather,
        eval_copy_detection.py:162,186-194) reproduces the single-device
        per-block mAPs."""
        from tpu_ac.cli.eval_copy_detection import main
        from tpu_ac.models.registry import register_backbone, BackboneSpec
        from tpu_ac.models.vit import ViTConfig

        register_backbone("tiny_test_cd_dp", BackboneSpec(
            "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, img_size=32), None))
        args = ["--data_path", copydays_root, "--arch", "tiny_test_cd_dp",
                "--imsize", "32", "--batch_size_per_gpu", "3"]
        res1 = main(args)
        res_dp = main(args + ["--dp"])  # batch 3 rounds up to 8
        for block in res1:
            assert res_dp[block] == pytest.approx(res1[block], abs=1e-5)


class TestDistributedExtraction:
    def test_extract_mesh_matches_single(self, rng):
        """extract_copydetect_features(mesh=...) == the closure path."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from tpu_ac.train.copy_detection import extract_copydetect_features

        def tokens(p, x):
            pooled = jnp.mean(x, axis=(2, 3)) @ p["w"]  # [B, D]
            return jnp.stack([pooled, pooled * 0.5, pooled + 1.0], axis=1)

        params = {"w": jnp.asarray(
            rng.standard_normal((3, 6)).astype(np.float32))}
        imgs = rng.standard_normal((13, 3, 8, 8)).astype(np.float32)
        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        f_dp = extract_copydetect_features(tokens, imgs, 8, mesh=mesh,
                                           params=params)
        f_1 = extract_copydetect_features(
            lambda x: tokens(params, x), imgs, 8)
        np.testing.assert_allclose(f_dp, f_1, rtol=1e-5, atol=1e-6)
