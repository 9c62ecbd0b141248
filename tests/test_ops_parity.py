"""Op-level numerical parity against torch CPU.

Each tpu_ac.ops primitive replicates a torch/scipy op the reference pipeline
depends on; these tests pin the semantics (bucket boundaries, pixel-center
conventions, padding modes) rather than merely the shapes.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tpu_ac import ops


def _np(x):
    return np.asarray(x)


class TestAdaptiveAvgPool1d:
    @pytest.mark.parametrize(
        "length,out",
        [(6912, 2048), (4096, 4096), (9216, 2048), (8192, 4096),
         (100, 7), (7, 100), (785, 128), (3, 2)],
    )
    def test_matches_torch(self, rng, length, out):
        x = rng.standard_normal((5, length)).astype(np.float32)
        want = F.adaptive_avg_pool1d(torch.from_numpy(x)[:, None, :], out).squeeze(1).numpy()
        got = _np(ops.adaptive_avg_pool1d(jnp.asarray(x), out))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        got_mm = _np(ops.adaptive_avg_pool1d(jnp.asarray(x), out, use_matmul=True))
        np.testing.assert_allclose(got_mm, want, rtol=1e-4, atol=1e-5)

    def test_batched_shapes(self, rng):
        x = rng.standard_normal((4, 9, 300)).astype(np.float32)
        got = _np(ops.adaptive_avg_pool1d(jnp.asarray(x), 128))
        want = F.adaptive_avg_pool1d(torch.from_numpy(x), 128).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestPatchify:
    @pytest.mark.parametrize("patchsize,stride,hw", [(3, 1, (28, 28)), (3, 1, (7, 9)), (5, 2, (14, 14))])
    def test_matches_torch_unfold(self, rng, patchsize, stride, hw):
        h, w = hw
        x = rng.standard_normal((2, 6, h, w)).astype(np.float32)
        pad = (patchsize - 1) // 2
        unfolder = torch.nn.Unfold(kernel_size=patchsize, stride=stride, padding=pad)
        u = unfolder(torch.from_numpy(x))
        u = u.reshape(2, 6, patchsize, patchsize, -1).permute(0, 4, 1, 2, 3).numpy()
        got, (nh, nw) = ops.patchify(jnp.asarray(x), patchsize, stride)
        n_expected = ((h + 2 * pad - patchsize) // stride + 1,
                      (w + 2 * pad - patchsize) // stride + 1)
        assert (nh, nw) == n_expected
        np.testing.assert_allclose(_np(got), u, rtol=1e-6, atol=0)


class TestInterpolate:
    @pytest.mark.parametrize("in_hw,out_hw", [((28, 28), (28, 28)), ((28, 28), (56, 56)),
                                              ((14, 18), (28, 28)), ((28, 28), (224, 224)),
                                              ((10, 10), (7, 7))])
    def test_bilinear(self, rng, in_hw, out_hw):
        x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                             align_corners=False).numpy()
        got = _np(ops.interpolate_bilinear(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("in_hw,out_hw", [((28, 28), (56, 56)), ((28, 28), (17, 33)),
                                              ((8, 8), (28, 28))])
    def test_bicubic_size(self, rng, in_hw, out_hw):
        x = rng.standard_normal((1, 4, *in_hw)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bicubic",
                             align_corners=False).numpy()
        got = _np(ops.interpolate_bicubic(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bicubic_scale_factor(self, rng):
        # The DINO pos-embed path: scale_factor with a +0.1 fudge
        # (vision_transformer.py:186-191).
        x = rng.standard_normal((1, 768, 28, 28)).astype(np.float32)
        sf = (30.1 / 28.0, 30.1 / 28.0)
        with torch.no_grad():
            want = F.interpolate(torch.from_numpy(x), scale_factor=sf, mode="bicubic",
                                 recompute_scale_factor=False).numpy()
        got = _np(ops.interpolate_bicubic(jnp.asarray(x), scale_factor=sf))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_nearest_scale_factor(self, rng):
        x = rng.standard_normal((1, 1, 28, 28)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), scale_factor=8, mode="nearest").numpy()
        got = _np(ops.interpolate_nearest(jnp.asarray(x), scale_factor=(8.0, 8.0)))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


class TestAdhocLayerNorm:
    def test_matches_fresh_torch_layernorm(self, rng):
        x = rng.standard_normal((2, 768, 28, 28)).astype(np.float32)
        with torch.no_grad():
            ln = torch.nn.LayerNorm([768, 28, 28])
            want = ln(torch.from_numpy(x)).numpy()
        got = _np(ops.adhoc_layernorm(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestCdist:
    def test_matches_torch_cdist(self, rng):
        a = rng.standard_normal((784, 128)).astype(np.float32) * 3
        b = rng.standard_normal((600, 128)).astype(np.float32) * 3
        want = torch.cdist(torch.from_numpy(a), torch.from_numpy(b)).numpy()
        got = _np(ops.cdist(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_knn_exact(self, rng):
        q = rng.standard_normal((50, 32)).astype(np.float32)
        db = rng.standard_normal((200, 32)).astype(np.float32)
        d2, idx = ops.knn(jnp.asarray(q), jnp.asarray(db), k=5)
        full = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
        want_idx = np.argsort(full, axis=1)[:, :5]
        want_d2 = np.take_along_axis(full, want_idx, axis=1)
        np.testing.assert_allclose(_np(d2), want_d2, rtol=1e-4, atol=1e-4)
        # indices can differ on exact ties only; distances must agree
        got_d2 = np.take_along_axis(full, _np(idx), axis=1)
        np.testing.assert_allclose(got_d2, want_d2, rtol=1e-6, atol=1e-6)

    def test_knn_tiled_matches_untiled(self, rng):
        q = rng.standard_normal((300, 16)).astype(np.float32)
        db = rng.standard_normal((128, 16)).astype(np.float32)
        d_a, i_a = ops.knn(jnp.asarray(q), jnp.asarray(db), k=3, tile=128)
        d_b, i_b = ops.knn(jnp.asarray(q), jnp.asarray(db), k=3, tile=4096)
        np.testing.assert_allclose(_np(d_a), _np(d_b), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(_np(i_a), _np(i_b))

    def test_knn_ip_tiled_matches_untiled(self, rng):
        """SCAN mines with the whole bank as queries — the tiled IP path
        (bounding the live [tile, N] similarity matrix) must reproduce the
        one-shot matmul exactly, including the non-divisible tail."""
        q = rng.standard_normal((300, 16)).astype(np.float32)
        db = rng.standard_normal((128, 16)).astype(np.float32)
        s_a, i_a = ops.knn_ip(jnp.asarray(q), jnp.asarray(db), k=3, tile=128)
        s_b, i_b = ops.knn_ip(jnp.asarray(q), jnp.asarray(db), k=3, tile=4096)
        np.testing.assert_allclose(_np(s_a), _np(s_b), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(_np(i_a), _np(i_b))


class TestGaussianBlur:
    def test_matches_scipy(self, rng):
        import scipy.ndimage as ndimage
        x = rng.standard_normal((28, 28)).astype(np.float32)
        want = ndimage.gaussian_filter(x, sigma=4)
        got = _np(ops.gaussian_blur(jnp.asarray(x), sigma=4.0))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_batched(self, rng):
        import scipy.ndimage as ndimage
        x = rng.standard_normal((3, 224, 224)).astype(np.float32)
        want = np.stack([ndimage.gaussian_filter(img, sigma=4) for img in x])
        got = _np(ops.gaussian_blur(jnp.asarray(x), sigma=4.0))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
