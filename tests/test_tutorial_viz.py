"""Runnable tutorial (tutorial.py <- tutorial_nn.py) and the stage-2 sweep
alpha-heatmap export (examples/test.py:158-174 behavior behind --visualize)."""

import os
import pickle

import numpy as np


class TestTutorial:
    def test_synthetic_end_to_end(self, tmp_path):
        import tutorial

        res = tutorial.main(["--out_dir", str(tmp_path)])
        assert set(res) == {"train", "val"}
        for split, topk in (("train", 20), ("val", 5)):
            r = res[split]
            assert os.path.exists(r["path"])
            idx = np.load(r["path"])
            assert idx.shape == (96, topk + 1)  # self + topk (memory.py:51)
            # synthetic classes are separable by hue: neighbor accuracy far
            # above the 25% chance level of 4 classes
            assert r["accuracy"] > 0.5


class TestSweepVisualize:
    def test_export_alpha_heatmaps(self, tmp_path):
        from tpu_ac.data import make_synthetic_mvtec
        from tpu_ac.cli.evaluate import build_parser, export_alpha_heatmaps
        from tpu_ac.data.mvtec import DatasetSplit, MVTecDataset

        root = tmp_path / "mvtec"
        make_synthetic_mvtec(str(root), image_size=64)
        ds = MVTecDataset(str(root), classname="bottle",
                          split=DatasetSplit.TEST)
        n = len(ds.items)
        rng = np.random.default_rng(0)
        alpha = rng.random((n, 1, 16)).astype(np.float32)  # [N, 1, P]
        x = rng.random((n, 8)).astype(np.float32)
        pkl = tmp_path / "matrix_alpha_X_bottle_unsupervised.pickle"
        with open(pkl, "wb") as f:
            pickle.dump((alpha, x), f)

        args = build_parser().parse_args(
            ["--path", str(root), "--output_dir", str(tmp_path / "out"),
             "--visualize"])
        saved = export_alpha_heatmaps(str(pkl), str(root), "bottle", args,
                                      "unsupervised", 1.0)
        # one figure per distinct anomaly type (first image of each)
        types = []
        for it in ds.items:
            if it.anomaly not in types:
                types.append(it.anomaly)
        assert len(saved) == len(types)
        for p in saved:
            assert os.path.exists(p) and os.path.getsize(p) > 0
        assert all("visualize" in p for p in saved)
