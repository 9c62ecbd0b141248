"""Pallas kernels vs XLA references (interpreter mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ac.kernels import min_dists_all_pairs, min_dists_to_sets
from tpu_ac.ops.distances import cdist


class TestMinDistsKernel:
    @pytest.mark.parametrize("p,q,d", [(16, 16, 64), (100, 80, 200)])
    def test_matches_cdist_min(self, rng, p, q, d):
        zi = rng.standard_normal((p, d)).astype(np.float32)
        bank = rng.standard_normal((5, q, d)).astype(np.float32)
        got = np.asarray(min_dists_to_sets(jnp.asarray(zi), jnp.asarray(bank),
                                           d_tile=128))
        want = np.stack([
            np.asarray(jnp.min(cdist(jnp.asarray(zi), jnp.asarray(bank[j])),
                               axis=1))
            for j in range(5)
        ])
        assert got.shape == (5, p)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_all_pairs_matches_per_query(self, rng):
        Z = rng.standard_normal((4, 24, 96)).astype(np.float32)
        bank = rng.standard_normal((3, 16, 96)).astype(np.float32)
        got = np.asarray(min_dists_all_pairs(jnp.asarray(Z),
                                             jnp.asarray(bank), d_tile=128))
        assert got.shape == (4, 3, 24)
        for i in range(4):
            want = np.asarray(min_dists_to_sets(jnp.asarray(Z[i]),
                                                jnp.asarray(bank),
                                                d_tile=128))
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("n_i,ti", [(5, 2), (4, 4), (3, 8)])
    def test_query_blocking_and_padding(self, rng, n_i, ti):
        """ti-blocked queries (incl. n_i not divisible by ti, and ti
        clamped to n_i) match the unblocked result."""
        Z = rng.standard_normal((n_i, 24, 96)).astype(np.float32)
        bank = rng.standard_normal((3, 16, 96)).astype(np.float32)
        want = np.asarray(min_dists_all_pairs(jnp.asarray(Z),
                                              jnp.asarray(bank),
                                              d_tile=128, ti=1))
        got = np.asarray(min_dists_all_pairs(jnp.asarray(Z),
                                             jnp.asarray(bank),
                                             d_tile=128, ti=ti))
        assert got.shape == (n_i, 3, 24)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_self_distance_zero(self, rng):
        z = rng.standard_normal((12, 32)).astype(np.float32)
        got = np.asarray(min_dists_to_sets(jnp.asarray(z),
                                           jnp.asarray(z[None]), d_tile=128))
        # mm-formulation cancellation floor: "f32" mode computes products
        # via the compensated hi/lo decomposition (Mosaic cannot do true
        # f32 products — see kernels/distances.py), whose dropped lo.lo'
        # term leaves d2(i,i) ~ |z|^2 * 2^-18 -> d ~ |z| * 2^-9 instead of
        # torch.cdist's ~1e-3 mm floor.  Still ~5e-4 relative to real
        # distances; distinct-pair accuracy is ~1e-5 (the trade that
        # matters for alpha).
        np.testing.assert_allclose(got[0], 0.0, atol=0.06)


class TestSymmetricMode:
    """symmetric=True (unsupervised alpha): upper-triangle tiles emit both
    row- and col-mins; the stitched result must match the all-pairs sweep."""

    @pytest.mark.parametrize("precision", ["f32", "bf16c", "bf16"])
    @pytest.mark.parametrize("n,p,ti", [
        (6, 24, 2),      # even blocks
        (5, 20, 2),      # n not divisible by ti (padded query images)
        (7, 19, 4),      # p not divisible by 16 (col-min needs the p mask)
        (4, 24, 1),      # per-image blocks
    ])
    def test_matches_all_pairs(self, rng, precision, n, p, ti):
        Z = jnp.asarray(rng.standard_normal((n, p, 96)).astype(np.float32))
        want = np.asarray(min_dists_all_pairs(Z, Z, d_tile=96, ti=ti,
                                              precision=precision))
        got = np.asarray(min_dists_all_pairs(Z, Z, d_tile=96, ti=ti,
                                             precision=precision,
                                             symmetric=True))
        assert got.shape == (n, n, p)
        # identical products in the identical contraction order; only the
        # a2/b2 rank-1 additions swap between the two triangles (~1 ulp),
        # which can flip the argmin on exact ties — compare values only
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_shape_mismatch_raises(self, rng):
        Z = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))
        bank = jnp.asarray(rng.standard_normal((3, 8, 32)).astype(np.float32))
        with pytest.raises(ValueError, match="symmetric"):
            min_dists_all_pairs(Z, bank, symmetric=True)


class TestWindowMode:
    """min_dists_window (the triangle-SHARDED sweep): a device owning
    contiguous rows a = off + r sweeps circulant columns b = (off+1+w) % N;
    tile (r, w) is active iff r <= w < r + H and must emit both mins[a, b]
    (row-min) and mins[b, a] (col-min) matching the all-pairs sweep."""

    @pytest.mark.parametrize("precision", ["f32", "bf16"])
    @pytest.mark.parametrize("n,off,n_local,ti", [
        (8, 2, 2, 2),    # interior device, even blocks
        (8, 6, 2, 2),    # window wraps around the bank end
        (7, 0, 3, 2),    # odd N, n_local not divisible by ti
        (8, 3, 1, 1),    # single-row device
    ])
    def test_active_tiles_match_all_pairs(self, rng, precision, n, off,
                                          n_local, ti):
        from tpu_ac.kernels.distances import min_dists_window

        p = 20
        Z = jnp.asarray(rng.standard_normal((n, p, 96)).astype(np.float32))
        h = n // 2
        w_win = n_local - 1 + h
        idx = (off + 1 + np.arange(w_win)) % n
        bank_w = Z[jnp.asarray(idx)]
        row, col = min_dists_window(Z[off:off + n_local], bank_w, window=h,
                                    d_tile=96, precision=precision, ti=ti)
        assert row.shape == (n_local, w_win, p)
        assert col.shape == (w_win, n_local, p)
        want = np.asarray(min_dists_all_pairs(Z, Z, d_tile=96,
                                              precision=precision))
        for r in range(n_local):
            for w in range(w_win):
                if not (r <= w < r + h):
                    continue  # inactive tile: contents undefined
                a, b = off + r, int(idx[w])
                np.testing.assert_allclose(
                    np.asarray(row[r, w]), want[a, b], rtol=1e-5, atol=1e-5,
                    err_msg=f"row-min pair ({a},{b})")
                np.testing.assert_allclose(
                    np.asarray(col[w, r]), want[b, a], rtol=1e-5, atol=1e-5,
                    err_msg=f"col-min pair ({b},{a})")

    def test_bad_window_raises(self, rng):
        from tpu_ac.kernels.distances import min_dists_window

        Z = jnp.asarray(rng.standard_normal((2, 8, 32)).astype(np.float32))
        with pytest.raises(ValueError, match="window"):
            min_dists_window(Z, Z, window=0)


class TestPrecisionModes:
    """bf16c (compensated hi/lo split) and bf16 vs the f32 kernel."""

    def _data(self, _rng, scale=1.0):
        # hermetic rng: the margin asserts below (error-ratio, tolerance
        # bands) must not depend on the shared session stream's position
        rng = np.random.default_rng(7)
        Z = (scale * rng.standard_normal((4, 24, 128))).astype(np.float32)
        bank = (scale * rng.standard_normal((3, 16, 128))).astype(np.float32)
        return jnp.asarray(Z), jnp.asarray(bank)

    def test_bf16c_matches_f32_tightly(self, rng):
        Z, bank = self._data(rng)
        f32 = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128))
        comp = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128,
                                              precision="bf16c"))
        # hi/lo split recovers products to ~2^-16 relative; distances on
        # unit-scale data differ in the 4th decimal at worst.
        np.testing.assert_allclose(comp, f32, rtol=3e-4, atol=3e-4)

    def test_bf16c_beats_plain_bf16(self, rng):
        """The compensation must actually buy accuracy, not just cost."""
        Z, bank = self._data(rng)
        f32 = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128))
        comp = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128,
                                              precision="bf16c"))
        fast = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128,
                                              precision="bf16"))
        assert np.abs(comp - f32).max() < np.abs(fast - f32).max() / 4

    def test_bf16_close_and_nonnegative(self, rng):
        Z, bank = self._data(rng)
        f32 = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128))
        fast = np.asarray(min_dists_all_pairs(Z, bank, d_tile=128,
                                              precision="bf16"))
        # single-pass bf16 of the rounded vectors: ~2^-9 relative per
        # coordinate -> percent-level distances on unit-scale data
        np.testing.assert_allclose(fast, f32, rtol=3e-2, atol=3e-2)
        assert (fast >= 0.0).all()

    def test_bad_precision_raises(self, rng):
        Z, bank = self._data(rng)
        with pytest.raises(ValueError):
            min_dists_all_pairs(Z, bank, precision="fp8")


class TestAlphaWithKernel:
    def test_alpha_kernel_path_matches_xla_path(self, rng):
        """weight_distance via the kernel == the XLA formulation."""
        from tpu_ac.cluster.alpha import weight_distance_unsupervised

        Z = rng.standard_normal((6, 16, 64)).astype(np.float32)
        zj = jnp.asarray(Z)
        want = np.asarray(weight_distance_unsupervised(zj, impl="xla"))
        got = np.asarray(weight_distance_unsupervised(zj, impl="pallas"))
        # kernel "f32" = compensated decomposition: distinct pairs agree to
        # ~1e-5 but the j == i self-term carries the lo.lo' floor divided
        # by (n-1) — a few 1e-4 relative on W (see kernels/distances.py)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)

    @pytest.mark.parametrize("precision", ["bf16c", "bf16"])
    def test_alpha_precision_modes_cluster_identically(self, precision):
        """Reduced-precision alpha weights keep the per-row ordering (and
        hence the downstream argmax/softmax structure) on separated data."""
        from tpu_ac.cluster.alpha import (
            alpha_from_weights,
            weight_distance_unsupervised,
        )

        # two separated clusters of images; hermetic rng — the >0.9 argmax
        # margin must not depend on the shared stream's position
        rng = np.random.default_rng(11)
        Z = rng.standard_normal((8, 16, 64)).astype(np.float32)
        Z[4:] += 8.0
        zj = jnp.asarray(Z)
        a32 = np.asarray(alpha_from_weights(
            weight_distance_unsupervised(zj, impl="pallas"), tau=1.0))
        alo = np.asarray(alpha_from_weights(
            weight_distance_unsupervised(zj, impl="pallas",
                                         precision=precision), tau=1.0))
        tol = 1e-3 if precision == "bf16c" else 2e-2
        np.testing.assert_allclose(alo, a32, rtol=tol, atol=tol)
        # the heaviest patch per image survives the precision drop
        assert (a32.argmax(1) == alo.argmax(1)).mean() > 0.9

    def test_supervised_precision_plumbs(self, rng):
        from tpu_ac.cluster.alpha import weight_distance_supervised

        Z = rng.standard_normal((3, 8, 32)).astype(np.float32)
        Zt = rng.standard_normal((2, 8, 32)).astype(np.float32)
        f32 = np.asarray(weight_distance_supervised(
            jnp.asarray(Z), jnp.asarray(Zt), impl="pallas"))
        comp = np.asarray(weight_distance_supervised(
            jnp.asarray(Z), jnp.asarray(Zt), impl="pallas",
            precision="bf16c"))
        np.testing.assert_allclose(comp, f32, rtol=1e-3, atol=1e-3)
