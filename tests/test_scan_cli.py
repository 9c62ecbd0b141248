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

    def test_full_pipeline_train_dp(self, tmp_path):
        """train_dp: N — every stage's train step sharded over the dp mesh
        (the reference's torch.nn.DataParallel around the SCAN models,
        scan.py:48 / selflabel.py:45 / simclr.py:44)."""
        from tpu_ac.cli.scan import main

        env = tmp_path / "env.yml"
        env.write_text(f"root_dir: {tmp_path}/out\n")
        exp = tmp_path / "exp.yml"
        exp.write_text(
            "train_db_name: synthetic\n"
            "num_classes: 2\n"
            "synthetic_per_class: 8\n"
            "image_size: 32\n"
            "num_heads: 2\n"
            "num_neighbors: 3\n"
            "batch_size: 8\n"
            "epochs: 1\n"
            "feature_dim: 16\n"
            "lr: 0.05\n"
            "train_dp: 4\n")
        for stage in ("simclr", "scan", "selflabel"):
            main([stage, "--config_env", str(env), "--config_exp", str(exp)])
        out = os.path.join(str(tmp_path), "out", "synthetic")
        assert os.path.isdir(os.path.join(out, "selflabel", "model-00000000"))

    def test_train_dp_ragged_batches(self, tmp_path):
        """Dataset smaller than one batch with train_dp set: the fallback
        whole-set batch must be trimmed to the dp multiple, not die in
        pjit with a 'not divisible' error (torch DataParallel splits
        ragged batches; GSPMD requires divisibility)."""
        from tpu_ac.cli.scan import main

        env = tmp_path / "env.yml"
        env.write_text(f"root_dir: {tmp_path}/out\n")
        exp = tmp_path / "exp.yml"
        exp.write_text(
            "train_db_name: synthetic\n"
            "num_classes: 2\n"
            "synthetic_per_class: 5\n"   # n=10: not a multiple of dp=4
            "image_size: 32\n"
            "num_neighbors: 3\n"
            "batch_size: 64\n"           # > n: the whole-set fallback batch
            "epochs: 1\n"
            "feature_dim: 16\n"
            "lr: 0.05\n"
            "train_dp: 4\n")
        main(["simclr", "--config_env", str(env), "--config_exp", str(exp)])

    def test_epoch_batches_dp_trimming(self):
        from tpu_ac.cli.scan import _epoch_batches

        # small-dataset fallback trims to the dp multiple
        (b,) = list(_epoch_batches(10, 100, seed=0, multiple_of=4))
        assert len(b) == 8
        # regular batches trim batch_size down to a multiple
        bs = [len(b) for b in _epoch_batches(10, 7, seed=0, multiple_of=4)]
        assert bs == [4, 4]
        with pytest.raises(ValueError, match="train_dp"):
            list(_epoch_batches(3, 100, seed=0, multiple_of=4))
        with pytest.raises(ValueError, match="train_dp"):
            list(_epoch_batches(100, 3, seed=0, multiple_of=4))


@pytest.fixture(scope="module")
def synthetic_imagenet(tmp_path_factory):
    """Tiny ImageFolder tree: <root>/{train,val}/<wnid>/*.png + subset
    file, matching the layout data/imagenet.py:1-102 walks."""
    import numpy as np
    from PIL import Image

    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.default_rng(0)
    wnids = ["n01000001", "n01000002"]
    for split, n in (("train", 6), ("val", 3)):
        for ci, wnid in enumerate(wnids):
            d = root / split / wnid
            d.mkdir(parents=True)
            for i in range(n):
                arr = np.zeros((72, 80, 3), np.uint8)
                arr[..., ci] = 200
                arr += rng.integers(0, 40, arr.shape).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.png")
    subset = root / "subset.txt"
    subset.write_text("".join(f"{w} class_{i}\n"
                              for i, w in enumerate(wnids)))
    return str(root), str(subset)


class TestMocoStage:
    """moco.py:64-110 equivalent: weight transfer + neighbor mining with
    the ImageNet ResNet-50 on a synthetic ImageFolder."""

    def test_moco_stage_end_to_end(self, synthetic_imagenet,
                                   tmp_path_factory):
        from tpu_ac.cli.scan import main

        data_root, subset = synthetic_imagenet
        out = tmp_path_factory.mktemp("moco_out")
        env = out / "env.yml"
        env.write_text(f"root_dir: {out}/artifacts\n"
                       f"data_root: {data_root}\n")
        exp = out / "exp.yml"
        exp.write_text(
            "setup: moco\n"
            "train_db_name: imagenet_50\n"
            "backbone: resnet50\n"
            "num_classes: 2\n"
            "image_size: 64\n"  # keep the resnet50 forward cheap on CPU
            "feature_dim: 16\n"
            "batch_size: 4\n"
            "num_neighbors: 2\n"
            "epochs: 1\n"
            f"subset_file: {subset}\n")
        main(["moco", "--config_env", str(env), "--config_exp", str(exp)])
        base = os.path.join(str(out), "artifacts", "imagenet_50")
        import numpy as np

        idx = np.load(os.path.join(base, "top2-train-neighbors.npy"))
        assert idx.shape == (12, 3)  # 12 train images, self + top-2
        assert os.path.exists(os.path.join(base, "top5-val-neighbors.npy"))
        assert os.path.isdir(os.path.join(base, "pretext",
                                          "model-00000000"))
        # the moco -> scan handoff must restore the optimizer-free pretext
        # model (regression: a full-train-state template hardcoding the
        # SimCLR optimizer could not load moco-saved checkpoints)
        main(["scan", "--config_env", str(env), "--config_exp", str(exp)])
        assert os.path.isdir(os.path.join(base, "scan", "model-00000000"))

    def test_load_imagenet_subset_dataset(self, synthetic_imagenet):
        from tpu_ac.data.classification import load_imagenet

        data_root, subset = synthetic_imagenet
        ds = load_imagenet(data_root, "train", subset_file=subset, size=64)
        assert len(ds) == 12 and ds.images.shape[1:] == (64, 64, 3)
        assert sorted(set(ds.labels.tolist())) == [0, 1]
        ds_all = load_imagenet(data_root, "val", size=64)
        assert len(ds_all) == 6
