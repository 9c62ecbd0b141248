"""SCAN stage CLI smoke: all four stages on a micro synthetic config."""

import os

import pytest


@pytest.fixture(scope="module")
def scan_cfg_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("scan")
    env = root / "env.yml"
    env.write_text(f"root_dir: {root}/out\n")
    exp = root / "exp.yml"
    exp.write_text(
        "train_db_name: synthetic\n"
        "num_classes: 2\n"
        "synthetic_per_class: 8\n"
        "image_size: 32\n"
        "num_heads: 2\n"
        "num_neighbors: 3\n"
        "batch_size: 8\n"
        "epochs: 2\n"
        "feature_dim: 16\n"
        "lr: 0.05\n")
    return str(env), str(exp)


class TestScanCLIStages:
    def test_full_pipeline(self, scan_cfg_files):
        from tpu_ac.cli.scan import main

        env, exp = scan_cfg_files
        for stage in ("simclr", "scan", "selflabel", "eval"):
            main([stage, "--config_env", env, "--config_exp", exp])
        # stage artifacts exist
        out = os.path.join(os.path.dirname(env), "out", "synthetic")
        assert os.path.exists(os.path.join(out, "top3-train-neighbors.npy"))
        assert os.path.isdir(os.path.join(out, "scan", "model-00000000"))
        assert os.path.isdir(os.path.join(out, "selflabel", "model-00000000"))
