"""Device-side DINO multi-crop augmentation (tpu_ac/data/device_aug.py).

The PIL path stays the golden reference for per-op math; these tests pin
(a) the torchvision blend/solarize/grayscale formulas against direct
recomputation, (b) the hue round trip against colorsys, (c) the blur
matrix against scipy's gaussian (interior rows) + row normalization,
(d) crop-box sampling statistics vs the torchvision protocol, and
(e) shapes / determinism / normalization of the full program.
"""

import colorsys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ac.data.device_aug import (
    DeviceAugConfig,
    _blur_matrix,
    _color_jitter_one,
    _crop_resize,
    _grayscale,
    _hsv_to_rgb,
    _rgb_to_hsv,
    _sample_boxes,
    device_multicrop,
    load_base_image,
)
from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


class TestColorOps:
    def test_hsv_round_trip_matches_colorsys(self, rng):
        x = rng.uniform(0, 1, (3, 5, 5)).astype(np.float32)
        hsv = np.asarray(_rgb_to_hsv(jnp.asarray(x)))
        back = np.asarray(_hsv_to_rgb(jnp.asarray(hsv)))
        np.testing.assert_allclose(back, x, atol=1e-5)
        for i in range(5):
            for j in range(5):
                h, s, v = colorsys.rgb_to_hsv(*x[:, i, j])
                np.testing.assert_allclose(hsv[:, i, j], [h, s, v],
                                           atol=1e-5)

    def test_jitter_blend_formulas(self, rng):
        """perm fixed to identity order: brightness, contrast,
        saturation, hue with factor 1 each == identity; brightness f=.5
        halves; contrast blends with the grayscale mean."""
        x = rng.uniform(0.2, 0.8, (3, 4, 4)).astype(np.float32)
        perm = jnp.asarray([0, 1, 2, 3])
        ident = np.asarray(_color_jitter_one(jnp.asarray(x), perm,
                                             1.0, 1.0, 1.0, 0.0))
        np.testing.assert_allclose(ident, x, atol=1e-5)
        half = np.asarray(_color_jitter_one(jnp.asarray(x), perm,
                                            0.5, 1.0, 1.0, 0.0))
        np.testing.assert_allclose(half, x * 0.5, atol=1e-5)
        con = np.asarray(_color_jitter_one(jnp.asarray(x), perm,
                                           1.0, 0.25, 1.0, 0.0))
        mean = (0.2989 * x[0] + 0.587 * x[1] + 0.114 * x[2]).mean()
        np.testing.assert_allclose(con, 0.25 * x + 0.75 * mean, atol=1e-5)

    def test_grayscale_weights(self, rng):
        x = rng.uniform(0, 1, (3, 4, 4)).astype(np.float32)
        g = np.asarray(_grayscale(jnp.asarray(x)))
        np.testing.assert_allclose(
            g[0], 0.2989 * x[0] + 0.587 * x[1] + 0.114 * x[2], atol=1e-6)


class TestBlurMatrix:
    def test_interior_rows_are_gaussian_and_rows_normalize(self):
        sigma, size, k = 1.3, 32, 13
        m = np.asarray(_blur_matrix(jnp.float32(sigma), size, k))
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
        r = k // 2
        offs = np.arange(-r, r + 1)
        taps = np.exp(-0.5 * (offs / sigma) ** 2)
        taps /= taps.sum()
        np.testing.assert_allclose(m[16, 16 - r:16 + r + 1], taps,
                                   atol=1e-6)
        assert m[16, 0] == 0.0  # banded

    def test_blur_preserves_constant_image(self):
        from tpu_ac.data.device_aug import _blur_one

        x = jnp.full((3, 16, 16), 0.37)
        y = np.asarray(_blur_one(x, jnp.float32(1.5), 13))
        np.testing.assert_allclose(y, 0.37, atol=1e-5)


class TestCropBoxes:
    def test_boxes_in_bounds_and_area_in_scale(self):
        key = jax.random.PRNGKey(0)
        n, size = 512, 256
        top, left, ch, cw = (np.asarray(v) for v in
                             _sample_boxes(key, n, size, (0.4, 1.0)))
        assert (top >= 0).all() and (left >= 0).all()
        assert (top + ch <= size).all() and (left + cw <= size).all()
        areas = ch * cw / (size * size)
        # rounding wobbles the edges; the bulk must sit inside [0.4, 1]
        assert np.quantile(areas, 0.02) > 0.35
        assert np.mean((areas > 0.38) & (areas < 1.01)) > 0.95
        ratio = cw / ch
        assert (ratio > 0.7).all() and (ratio < 1.43).all()

    def test_tiny_scale_locals(self):
        key = jax.random.PRNGKey(1)
        top, left, ch, cw = (np.asarray(v) for v in
                             _sample_boxes(key, 256, 256, (0.05, 0.4)))
        assert (ch * cw / 256.0 ** 2 < 0.45).all()
        assert (ch >= 1).all() and (cw >= 1).all()

    def test_crop_resize_identity_box(self, rng):
        """Full-image box at the same size == identity resample."""
        x = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
        y = np.asarray(_crop_resize(x, jnp.float32(0), jnp.float32(0),
                                    jnp.float32(32), jnp.float32(32), 32))
        np.testing.assert_allclose(y, np.asarray(x), atol=1e-4)

    def test_crop_resize_matches_pil_region(self, rng):
        """An aligned sub-box downsampled 2x matches PIL's
        crop().resize(BICUBIC) closely (both are antialiased cubic)."""
        from PIL import Image

        arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        x = jnp.asarray(arr.transpose(2, 0, 1).astype(np.float32) / 255.0)
        got = np.asarray(_crop_resize(x, jnp.float32(8), jnp.float32(16),
                                      jnp.float32(32), jnp.float32(32),
                                      16))
        ref = Image.fromarray(arr).crop((16, 8, 48, 40)).resize(
            (16, 16), Image.BICUBIC)
        ref = np.asarray(ref, np.float32).transpose(2, 0, 1) / 255.0
        # interior agreement (PIL quantizes to uint8; edges differ by
        # boundary handling)
        assert np.abs(got[:, 2:-2, 2:-2] - ref[:, 2:-2, 2:-2]).mean() < 0.02


class TestFullProgram:
    CFG = DeviceAugConfig(local_crops_number=3, global_size=32,
                          local_size=16, base_size=64)

    def _base(self, rng, b=4):
        return jnp.asarray(rng.integers(0, 255, (b, 3, 64, 64)),
                           jnp.uint8)

    def test_shapes_order_and_dtype(self, rng):
        g, l = device_multicrop(self._base(rng), jax.random.PRNGKey(0),
                                self.CFG)
        assert g.shape == (8, 3, 32, 32) and g.dtype == jnp.float32
        assert l.shape == (12, 3, 16, 16)

    def test_deterministic_per_key(self, rng):
        base = self._base(rng)
        g1, l1 = device_multicrop(base, jax.random.PRNGKey(7), self.CFG)
        g2, l2 = device_multicrop(base, jax.random.PRNGKey(7), self.CFG)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        g3, _ = device_multicrop(base, jax.random.PRNGKey(8), self.CFG)
        assert not np.array_equal(np.asarray(g1), np.asarray(g3))

    def test_normalized_range(self, rng):
        """Outputs are (x - mean)/std of values in [0, 1]."""
        g, l = device_multicrop(self._base(rng), jax.random.PRNGKey(0),
                                self.CFG)
        for arr in (np.asarray(g), np.asarray(l)):
            un = arr * np.asarray(IMAGENET_STD).reshape(3, 1, 1) \
                + np.asarray(IMAGENET_MEAN).reshape(3, 1, 1)
            assert un.min() > -1e-4 and un.max() < 1.0 + 1e-4

    def test_no_local_crops(self, rng):
        import dataclasses

        cfg = dataclasses.replace(self.CFG, local_crops_number=0)
        g, l = device_multicrop(self._base(rng), jax.random.PRNGKey(0),
                                cfg)
        assert l is None and g.shape[0] == 8

    def test_crop_major_order_matches_prefetcher(self, rng):
        """g = [all first-globals; all second-globals] — same slot-major
        layout as CropBatchPrefetcher._assemble, which dino_loss's
        reshape(ncrops, B, ...) depends on.  Slots use different keys, so
        first-vs-second globals of one image must differ."""
        base = self._base(rng)
        g, _ = device_multicrop(base, jax.random.PRNGKey(0), self.CFG)
        g = np.asarray(g)
        assert not np.allclose(g[0], g[4])  # img0 slot1 vs img0 slot2

    def test_load_base_image(self, rng):
        from PIL import Image

        img = Image.fromarray(rng.integers(0, 255, (80, 120, 3)).astype(
            np.uint8))
        base = load_base_image(img, 64)
        assert base.shape == (3, 64, 64) and base.dtype == np.uint8


class TestBaseCache:
    def test_passthrough_and_validation(self, rng):
        base = rng.integers(0, 255, (3, 24, 24)).astype(np.uint8)
        assert load_base_image(base, 24) is base
        with pytest.raises(ValueError):
            load_base_image(base, 32)  # wrong size
        with pytest.raises(ValueError):
            load_base_image(base.astype(np.float32), 24)  # wrong dtype

    def test_build_matches_direct_decode_and_reuses(self, rng, tmp_path):
        from PIL import Image

        from tpu_ac.data.device_aug import build_base_cache
        from tpu_ac.data.imagefolder import ImageFolder

        root = tmp_path / "data"
        for cls in ("a", "b"):
            (root / cls).mkdir(parents=True)
            for i in range(3):
                arr = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
                Image.fromarray(arr).save(root / cls / f"{i}.png")
        ds = ImageFolder(str(root))
        cache = build_base_cache(ds, 24, str(tmp_path / "cache"))
        assert cache.shape == (6, 3, 24, 24) and cache.dtype == np.uint8
        for i in range(6):
            np.testing.assert_array_equal(
                cache[i], load_base_image(ds[i][0], 24))
        # second call maps the SAME file (keyed by path list + size)
        files = list((tmp_path / "cache").iterdir())
        assert len(files) == 1
        again = build_base_cache(ds, 24, str(tmp_path / "cache"))
        np.testing.assert_array_equal(np.asarray(again), np.asarray(cache))
        assert len(list((tmp_path / "cache").iterdir())) == 1
        # a different base size is a different cache entry
        build_base_cache(ds, 16, str(tmp_path / "cache"))
        assert len(list((tmp_path / "cache").iterdir())) == 2

    def test_failed_build_cleans_tmp_and_can_retry(self, rng, tmp_path):
        """A builder that dies mid-decode removes its per-process temp
        file (concurrent builders use pid-suffixed temps so they cannot
        truncate each other); a retry then succeeds."""
        from PIL import Image

        from tpu_ac.data.device_aug import build_base_cache
        from tpu_ac.data.imagefolder import ImageFolder

        root = tmp_path / "data"
        (root / "a").mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (20, 20, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / "a" / f"{i}.png")
        ds = ImageFolder(str(root))

        class Flaky:
            samples = ds.samples
            calls = 0

            def __getitem__(self, i):
                if i == 2 and Flaky.calls == 0:
                    Flaky.calls += 1
                    raise OSError("truncated file")
                return ds[i]

        cache_dir = tmp_path / "cache"
        with pytest.raises(OSError):
            build_base_cache(Flaky(), 16, str(cache_dir))
        assert not any(".tmp" in p.name for p in cache_dir.iterdir())
        out = build_base_cache(Flaky(), 16, str(cache_dir))
        assert out.shape == (3, 3, 16, 16)
