"""End-to-end drives of the k-NN and linear-probe eval CLIs.

The library math (knn_classifier, make_linear_probe) is oracle-tested in
test_utils_evals.py; these exercise the argparse entry points themselves
(dino-main/eval_knn.py:185-242, eval_linear.py:31-150 equivalents):
ImageFolder walk -> feature extraction -> classifier -> printed report.
"""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def imagefolder_root(tmp_path_factory):
    """train/ and val/ ImageFolder splits with two far-separated classes
    (dark vs bright) so even a random-init backbone's features separate."""
    root = tmp_path_factory.mktemp("imagefolder")
    rng = np.random.default_rng(0)
    for split, n_per_class in (("train", 6), ("val", 4)):
        for cls, base in (("class_a", 30), ("class_b", 220)):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n_per_class):
                arr = np.clip(base + rng.integers(-20, 20, (32, 32, 3)),
                              0, 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def tiny_arch():
    from tpu_ac.models.registry import BackboneSpec, register_backbone
    from tpu_ac.models.vit import ViTConfig

    name = "tiny_test_evalcli"
    register_backbone(name, BackboneSpec(
        "vit", ViTConfig(patch_size=8, embed_dim=32, depth=4, num_heads=2,
                         img_size=32), None))
    return name


class TestEvalKNNCLI:
    def test_cli_end_to_end(self, imagefolder_root, tiny_arch, tmp_path,
                            capsys):
        from tpu_ac.cli.eval_knn import main

        dump = str(tmp_path / "features.npz")
        main(["--arch", tiny_arch, "--data_path", imagefolder_root,
              "--nb_knn", "3", "5", "--imagesize", "32",
              "--batch_size_per_gpu", "8", "--dump_features", dump])
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines() if "NN classifier result" in l]
        assert len(lines) == 2 and lines[0].startswith("3-NN")
        top1 = float(lines[0].split("Top1:")[1].split(",")[0])
        # dark-vs-bright classes are trivially separable even through a
        # random-init backbone; chance is 50
        assert top1 >= 75.0
        # --dump_features wrote the rank-0 feature matrices (eval_knn.py
        # dump_features behavior)
        z = np.load(dump)
        assert set(z.files) == {"train", "val", "train_labels", "val_labels"}
        assert z["train"].shape == (12, 32) and z["val"].shape == (8, 32)
        np.testing.assert_allclose(
            np.linalg.norm(z["val"], axis=1), 1.0, rtol=1e-4)

    def test_cli_dp_matches_single(self, imagefolder_root, tiny_arch,
                                   tmp_path, capsys):
        """--dp 8: GSPMD-sharded extraction (the reference's cross-rank
        extract + all_gather, eval_knn.py:118-139) must produce the SAME
        feature matrices as the single-device path."""
        from tpu_ac.cli.eval_knn import main

        single = str(tmp_path / "single.npz")
        dp = str(tmp_path / "dp.npz")
        base = ["--arch", tiny_arch, "--data_path", imagefolder_root,
                "--nb_knn", "3", "--imagesize", "32",
                "--batch_size_per_gpu", "8"]
        main(base + ["--dump_features", single])
        main(base + ["--dump_features", dp, "--dp", "8"])
        capsys.readouterr()
        a, b = np.load(single), np.load(dp)
        for key in ("train", "val"):
            np.testing.assert_allclose(b[key], a[key], rtol=2e-5, atol=2e-6)

    def test_cli_dp_rejects_indivisible_batch(self, imagefolder_root,
                                              tiny_arch):
        from tpu_ac.cli.eval_knn import main

        with pytest.raises(ValueError, match="divisible"):
            main(["--arch", tiny_arch, "--data_path", imagefolder_root,
                  "--imagesize", "32", "--batch_size_per_gpu", "6",
                  "--dp", "4"])

    def test_missing_split_raises(self, imagefolder_root, tiny_arch,
                                  tmp_path):
        from tpu_ac.cli.eval_knn import main

        empty = tmp_path / "no_splits"
        empty.mkdir()
        with pytest.raises(FileNotFoundError):
            main(["--arch", tiny_arch, "--data_path", str(empty),
                  "--imagesize", "32"])


class TestEvalLinearCLI:
    def test_cli_end_to_end(self, imagefolder_root, tiny_arch, capsys):
        from tpu_ac.cli.eval_linear import main

        main(["--arch", tiny_arch, "--data_path", imagefolder_root,
              "--n_last_blocks", "2", "--epochs", "20", "--lr", "0.05",
              "--batch_size_per_gpu", "4", "--imagesize", "32"])
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines() if "val top-1" in l]
        assert lines, out
        final_acc = float(lines[-1].split("val top-1")[1].split("%")[0])
        assert final_acc >= 75.0

    def test_cli_dp_end_to_end(self, imagefolder_root, tiny_arch, capsys):
        """--dp 4: sharded extraction AND a GSPMD data-parallel probe (the
        reference DDP-wraps its LinearClassifier, eval_linear.py:62)."""
        from tpu_ac.cli.eval_linear import main

        main(["--arch", tiny_arch, "--data_path", imagefolder_root,
              "--n_last_blocks", "2", "--epochs", "20", "--lr", "0.05",
              "--batch_size_per_gpu", "4", "--imagesize", "32",
              "--dp", "4"])
        out = capsys.readouterr().out
        lines = [l for l in out.splitlines() if "val top-1" in l]
        assert lines, out
        final_acc = float(lines[-1].split("val top-1")[1].split("%")[0])
        assert final_acc >= 75.0

    def test_avgpool_patchtokens_widens_features(self, imagefolder_root,
                                                 tiny_arch, capsys):
        # the ViT-Base protocol concatenates avg-pooled patch tokens
        # (eval_linear.py:56-63); drive the flag through the entry point
        from tpu_ac.cli.eval_linear import main

        main(["--arch", tiny_arch, "--data_path", imagefolder_root,
              "--n_last_blocks", "1", "--epochs", "2", "--lr", "0.05",
              "--batch_size_per_gpu", "4", "--imagesize", "32",
              "--avgpool_patchtokens"])
        out = capsys.readouterr().out
        assert "val top-1" in out
