"""Augmentation pipeline sanity (shapes, determinism, value ranges)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from tpu_ac.data.augment import (
    DINOAugmentation,
    SimCLRAugmentation,
    StrongAugmentation,
    WeakAugmentation,
    cutout,
    random_resized_crop,
    randaugment,
    to_normalized_array,
)


@pytest.fixture()
def img(rng):
    return Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB")


class TestElementaryOps:
    def test_random_resized_crop_size(self, img):
        import random
        out = random_resized_crop(img, 32, (0.2, 1.0), rng=random.Random(0))
        assert out.size == (32, 32)

    def test_randaugment_returns_image(self, img):
        import random
        out = randaugment(img, n=4, rng=random.Random(0))
        assert out.size == img.size

    def test_cutout_zeroes_region(self, rng):
        import random
        arr = np.ones((3, 32, 32), np.float32)
        out = cutout(arr, n_holes=1, length=16, rng=random.Random(0))
        assert (out == 0).sum() > 0
        assert out.shape == arr.shape

    def test_normalize_roundtrip(self, img):
        from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD
        arr = to_normalized_array(img)
        back = arr.transpose(1, 2, 0) * IMAGENET_STD + IMAGENET_MEAN
        np.testing.assert_allclose(back, np.asarray(img) / 255.0, atol=1e-6)


class TestDINOAugmentation:
    def test_crop_count_and_shapes(self, img):
        aug = DINOAugmentation(local_crops_number=6, global_size=48,
                               local_size=24, seed=0)
        crops = aug(img)
        assert len(crops) == 8
        assert all(c.shape == (3, 48, 48) for c in crops[:2])
        assert all(c.shape == (3, 24, 24) for c in crops[2:])

    def test_seeded_determinism(self, img):
        a = DINOAugmentation(seed=7, global_size=32, local_size=16,
                             local_crops_number=2)(img)
        b = DINOAugmentation(seed=7, global_size=32, local_size=16,
                             local_crops_number=2)(img)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestSCANAugmentations:
    def test_simclr_shape(self, img):
        out = SimCLRAugmentation(size=32, seed=0)(img)
        assert out.shape == (3, 32, 32)

    def test_strong_has_cutout(self, img):
        out = StrongAugmentation(size=32, seed=0)(img)
        assert out.shape == (3, 32, 32)
        # cutout zeroes a square region after normalization; a strong
        # pipeline that dropped it would have no exact zeros
        assert (np.asarray(out) == 0.0).any()

    def test_weak_shape(self, img):
        out = WeakAugmentation(size=32, seed=0)(img)
        assert out.shape == (3, 32, 32)

    def test_val_transform_matches_torchvision_semantics(self):
        """ValTransform must be the reference's deterministic val pipeline:
        CenterCrop(size) + ToTensor + Normalize (common_config.py:247-251)
        — used for memory-bank fills and all SCAN predictions.  torchvision
        is not installed here, so the oracle reimplements F.center_crop's
        documented coordinate math (crop_top = round((h - ch) / 2), zero
        padding when the image is smaller) directly in numpy."""
        from tpu_ac.data.augment import ValTransform
        from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD

        rng = np.random.default_rng(0)
        for w, h, size in ((40, 36, 32), (33, 47, 32), (32, 32, 32),
                           (28, 30, 32)):
            arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            padded = arr
            if w < size or h < size:
                pw, ph = max(size - w, 0), max(size - h, 0)
                padded = np.pad(arr, ((ph // 2, ph - ph // 2),
                                      (pw // 2, pw - pw // 2), (0, 0)))
            hh, ww = padded.shape[:2]
            top = int(round((hh - size) / 2.0))
            left = int(round((ww - size) / 2.0))
            crop = padded[top:top + size, left:left + size]
            want = ((crop / 255.0 - IMAGENET_MEAN) /
                    IMAGENET_STD).transpose(2, 0, 1)
            got = ValTransform(size=size)(Image.fromarray(arr))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_val_transform_deterministic(self, img):
        from tpu_ac.data.augment import ValTransform
        t = ValTransform(size=32)
        np.testing.assert_array_equal(t(img), t(img))


class TestCropBatchPrefetcher:
    """data/prefetch.py — the reference's DataLoader(num_workers) role."""

    def _setup(self, rng, n_local=2):
        from tpu_ac.data.augment import DINOAugmentation

        imgs = [Image.fromarray(
            rng.integers(0, 255, (48, 48, 3)).astype(np.uint8))
            for _ in range(10)]
        aug = DINOAugmentation(local_crops_number=n_local, global_size=32,
                               local_size=16, seed=0)
        return imgs, aug

    def test_worker_count_invariant(self, rng):
        """Per-image rng keys: the crops are IDENTICAL at any worker
        count (serial, 1 worker, 4 workers) — augmentation must not
        depend on thread scheduling."""
        from tpu_ac.data.prefetch import CropBatchPrefetcher

        imgs, aug = self._setup(rng)
        batches = [[0, 3, 5], [7, 2, 9]]
        outs = []
        for workers in (0, 1, 4):
            pre = CropBatchPrefetcher(lambda i: imgs[i], aug, 2,
                                      num_workers=workers, seed=11)
            outs.append(list(pre.batches(epoch=1, idx_batches=batches)))
            pre.close()
        for got in outs[1:]:
            for (g0, l0), (g1, l1) in zip(outs[0], got):
                np.testing.assert_array_equal(g1, g0)
                np.testing.assert_array_equal(l1, l0)

    def test_shapes_and_epoch_variation(self, rng):
        from tpu_ac.data.prefetch import CropBatchPrefetcher

        imgs, aug = self._setup(rng)
        pre = CropBatchPrefetcher(lambda i: imgs[i], aug, 2,
                                  num_workers=2, seed=0)
        (g, l), = list(pre.batches(0, [[1, 2, 3, 4]]))
        assert g.shape == (8, 3, 32, 32)    # 2 globals x batch 4
        assert l.shape == (8, 3, 16, 16)    # 2 locals x batch 4
        (g2, _), = list(pre.batches(1, [[1, 2, 3, 4]]))
        assert not np.array_equal(g2, g)    # epoch keys the rng
        pre.close()

    def test_no_local_crops(self, rng):
        from tpu_ac.data.prefetch import CropBatchPrefetcher

        imgs, aug = self._setup(rng, n_local=0)
        pre = CropBatchPrefetcher(lambda i: imgs[i], aug, 0,
                                  num_workers=2, seed=0)
        (g, l), = list(pre.batches(0, [[0, 1]]))
        assert g.shape == (4, 3, 32, 32) and l is None
        pre.close()

    def test_transfer_hook_runs_in_prefetch(self, rng):
        """transfer= (the CLI's jax.device_put) is applied to the
        assembled arrays inside the lookahead, same values out."""
        from tpu_ac.data.prefetch import CropBatchPrefetcher

        imgs, aug = self._setup(rng)
        calls = []

        def mark(x):
            calls.append(x.shape)
            return jnp.asarray(x)

        plain = CropBatchPrefetcher(lambda i: imgs[i], aug, 2,
                                    num_workers=2, seed=3)
        moved = CropBatchPrefetcher(lambda i: imgs[i], aug, 2,
                                    num_workers=2, seed=3, transfer=mark)
        (g0, l0), = list(plain.batches(0, [[0, 1, 2]]))
        (g1, l1), = list(moved.batches(0, [[0, 1, 2]]))
        assert isinstance(g1, jnp.ndarray) and isinstance(l1, jnp.ndarray)
        assert len(calls) == 2
        np.testing.assert_array_equal(np.asarray(g1), g0)
        np.testing.assert_array_equal(np.asarray(l1), l0)
        plain.close()
        moved.close()


class TestUint8Emit:
    def test_uint8_crops_match_normalized(self, rng):
        """normalize=False emits the SAME crops as normalize=True (same
        rng draw sequence), just un-normalized uint8."""
        from tpu_ac.data.augment import DINOAugmentation
        from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD

        img = Image.fromarray(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
        kw = dict(local_crops_number=3, global_size=32, local_size=16)
        f32 = DINOAugmentation(**kw, seed=7)(img)
        u8 = DINOAugmentation(**kw, seed=7, normalize=False)(img)
        assert all(c.dtype == np.uint8 for c in u8)
        m = IMAGENET_MEAN[:, None, None]
        s = IMAGENET_STD[:, None, None]
        for cf, cu in zip(f32, u8):
            np.testing.assert_allclose(
                (cu.astype(np.float32) / 255.0 - m) / s, cf,
                rtol=0, atol=1e-6)


class TestParallelAugPool:
    """data/prefetch.py ParallelAugPool — the SCAN stages' DataLoader
    (num_workers=8) role."""

    def test_stack_worker_count_invariant(self, rng):
        from tpu_ac.data.augment import (
            SimCLRAugmentation, StrongAugmentation, WeakAugmentation)
        from tpu_ac.data.prefetch import ParallelAugPool

        imgs = [Image.fromarray(
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8))
            for _ in range(8)]
        for aug in (SimCLRAugmentation(size=32), WeakAugmentation(size=32),
                    StrongAugmentation(size=32)):
            outs = []
            for workers in (0, 1, 4):
                pool = ParallelAugPool(workers, seed=3)
                outs.append(pool.stack(aug, lambda i: imgs[i],
                                       [0, 5, 2, 7], epoch=2, start=10,
                                       stream="x"))
                pool.close()
            np.testing.assert_array_equal(outs[1], outs[0])
            np.testing.assert_array_equal(outs[2], outs[0])

    def test_stack_keys_vary(self, rng):
        from tpu_ac.data.augment import SimCLRAugmentation
        from tpu_ac.data.prefetch import ParallelAugPool

        img = Image.fromarray(
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8))
        aug = SimCLRAugmentation(size=32)
        pool = ParallelAugPool(2, seed=0)
        a = pool.stack(aug, lambda i: img, [0, 0], epoch=0, stream="i")
        b = pool.stack(aug, lambda i: img, [0, 0], epoch=0, stream="j")
        c = pool.stack(aug, lambda i: img, [0, 0], epoch=1, stream="i")
        assert not np.array_equal(a, b)      # stream keys the rng
        assert not np.array_equal(a, c)      # epoch keys the rng
        assert not np.array_equal(a[0], a[1])  # position keys the rng
        pool.close()

    def test_keyed_false_deterministic_transform(self, rng):
        from tpu_ac.data.augment import ValTransform
        from tpu_ac.data.prefetch import ParallelAugPool

        imgs = [Image.fromarray(
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8))
            for _ in range(6)]
        t = ValTransform(size=32)
        pool = ParallelAugPool(3)
        got = pool.stack(t, lambda i: imgs[i], range(6), keyed=False)
        want = np.stack([t(im) for im in imgs])
        np.testing.assert_array_equal(got, want)
        pool.close()

    def test_lookahead_order_and_serial(self):
        from tpu_ac.data.prefetch import ParallelAugPool

        for workers in (0, 2):
            pool = ParallelAugPool(workers)
            thunks = [lambda v=v: v * v for v in range(7)]
            assert list(pool.lookahead(iter(thunks))) == [
                v * v for v in range(7)]
            pool.close()
