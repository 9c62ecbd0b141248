"""Config system + classification datasets/wrappers."""

import os

import numpy as np
import pytest

from tpu_ac.config import Config, create_config, merge
from tpu_ac.data.classification import (
    ArrayDataset,
    AugmentedDataset,
    NeighborsDataset,
    make_synthetic_classification,
)


class TestConfig:
    def test_attribute_access_and_merge(self):
        a = Config.wrap({"model": {"dim": 64, "depth": 2}, "lr": 0.1})
        b = merge(a, {"model": {"dim": 128}, "extra": True})
        assert b.model.dim == 128 and b.model.depth == 2
        assert b.lr == 0.1 and b.extra is True

    def test_create_config_derived_paths(self, tmp_path):
        env = tmp_path / "env.yml"
        env.write_text(f"root_dir: {tmp_path}/out\n")
        exp = tmp_path / "exp.yml"
        exp.write_text("train_db_name: cifar-10\nnum_neighbors: 20\nlr: 0.4\n")
        cfg = create_config(str(env), str(exp))
        assert cfg.lr == 0.4
        assert cfg.pretext_dir.endswith("cifar-10/pretext")
        assert "top20-train-neighbors.npy" in cfg.topk_neighbors_train_path
        assert os.path.isdir(cfg.scan_dir)


class TestClassificationData:
    def test_synthetic_dataset(self):
        ds = make_synthetic_classification(n_per_class=5, n_classes=3)
        assert len(ds) == 15
        item = ds[0]
        assert item["target"] == 0
        assert item["image"].size == (32, 32)

    def test_augmented_dataset(self):
        from tpu_ac.data.augment import SimCLRAugmentation, WeakAugmentation

        ds = make_synthetic_classification(n_per_class=4, n_classes=2)
        wrapped = AugmentedDataset(ds, WeakAugmentation(32, seed=0),
                                   SimCLRAugmentation(32, seed=0))
        batch = wrapped.batch(range(4))
        assert batch["image"].shape == (4, 3, 32, 32)
        assert batch["image_augmented"].shape == (4, 3, 32, 32)
        assert not np.allclose(batch["image"], batch["image_augmented"])

    def test_neighbors_dataset(self):
        from tpu_ac.data.augment import WeakAugmentation

        ds = make_synthetic_classification(n_per_class=4, n_classes=2)
        idx = np.tile(np.arange(8)[:, None], (1, 3))
        wrapped = NeighborsDataset(ds, WeakAugmentation(32, seed=0), idx,
                                   seed=0)
        item = wrapped[2]
        assert item["anchor"].shape == (3, 32, 32)
        assert item["neighbor"].shape == (3, 32, 32)
        batch = wrapped.batch(range(4))
        assert batch["anchor"].shape == (4, 3, 32, 32)

    def test_cifar_loader_format(self, tmp_path):
        """Loader reads the standard pickle-batch format."""
        import pickle
        base = tmp_path / "cifar-10-batches-py"
        base.mkdir()
        rng = np.random.default_rng(0)
        for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            data = {b"data": rng.integers(0, 255, (10, 3072), dtype=np.uint8)
                    .astype(np.uint8),
                    b"labels": rng.integers(0, 10, 10).tolist()}
            with open(base / name, "wb") as f:
                pickle.dump(data, f)
        from tpu_ac.data.classification import load_cifar10
        train = load_cifar10(str(tmp_path), "train")
        test = load_cifar10(str(tmp_path), "test")
        assert len(train) == 50 and len(test) == 10
        assert train.images.shape == (50, 32, 32, 3)


class TestImageFolderSharding:
    def test_shards_disjoint_and_cover(self, tmp_path):
        import numpy as np
        from PIL import Image
        from tpu_ac.data.imagefolder import ImageFolder

        d = tmp_path / "c0"
        d.mkdir()
        for i in range(16):
            Image.new("RGB", (8, 8)).save(d / f"{i}.png")
        ds = ImageFolder(str(tmp_path))
        a = np.concatenate(list(ds.epoch_batches(4, seed=0, num_shards=2,
                                                 shard_index=0)))
        b = np.concatenate(list(ds.epoch_batches(4, seed=0, num_shards=2,
                                                 shard_index=1)))
        assert len(a) == len(b) == 8
        assert set(a.tolist()).isdisjoint(b.tolist())
        assert set(a.tolist()) | set(b.tolist()) == set(range(16))


class TestImageNetMmapCache:
    def test_mmap_cache_roundtrip(self, tmp_path):
        """mmap_cache decodes once to a .npy and memory-maps it; a second
        load reuses the cache and matches the in-memory decode."""
        import numpy as np
        from PIL import Image

        from tpu_ac.data.classification import load_imagenet

        root = tmp_path / "inet"
        rng = np.random.default_rng(0)
        for wnid in ("n01", "n02"):
            d = root / "train" / wnid
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(rng.integers(
                    0, 255, (40, 48, 3)).astype(np.uint8)).save(
                        d / f"img{i}.png")
        cache = str(tmp_path / "cache")
        ds_mem = load_imagenet(str(root), "train", size=32)
        ds_map = load_imagenet(str(root), "train", size=32,
                               mmap_cache=cache)
        assert isinstance(ds_map.images, np.memmap)
        np.testing.assert_array_equal(np.asarray(ds_map.images),
                                      ds_mem.images)
        np.testing.assert_array_equal(ds_map.labels, ds_mem.labels)
        # second load hits the existing cache file
        import os
        files = os.listdir(cache)
        ds_again = load_imagenet(str(root), "train", size=32,
                                 mmap_cache=cache)
        assert sorted(os.listdir(cache)) == sorted(files)
        np.testing.assert_array_equal(np.asarray(ds_again.images),
                                      ds_mem.images)


class TestShardedEpochBatches:
    def test_shards_equal_batch_counts(self, tmp_path):
        """Wrap-padded sharding (DistributedSampler semantics): every
        shard yields the same number of batches even when n % shards != 0."""
        import numpy as np
        from PIL import Image

        from tpu_ac.data.imagefolder import ImageFolder

        d = tmp_path / "cls" / "a"
        d.mkdir(parents=True)
        for i in range(11):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                d / f"{i}.png")
        ds = ImageFolder(str(tmp_path / "cls"))
        counts, seen = [], []
        for shard in range(2):
            batches = list(ds.epoch_batches(3, seed=0, drop_last=True,
                                            num_shards=2,
                                            shard_index=shard))
            counts.append(len(batches))
            seen.append(np.concatenate(batches))
        assert counts[0] == counts[1] == 2
        # shards are disjoint except for the wrap-padded duplicate
        overlap = set(seen[0]) & set(seen[1])
        assert len(overlap) <= 1
