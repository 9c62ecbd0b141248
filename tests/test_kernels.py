"""Pallas kernels vs XLA references (interpreter mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ac.kernels import fused_attention, min_dists_to_sets
from tpu_ac.ops.distances import cdist


class TestFusedAttention:
    @pytest.mark.parametrize("s", [64, 100, 785])
    def test_matches_xla_attention(self, rng, s):
        if s == 785:
            b, h, dh = 1, 2, 32  # keep interpreter time sane
        else:
            b, h, dh = 2, 3, 16
        q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        scale = dh ** -0.5
        got = np.asarray(fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
        attn = jax.nn.softmax(
            np.einsum("bhsd,bhtd->bhst", q, k) * scale, axis=-1)
        want = np.einsum("bhst,bhtd->bhsd", np.asarray(attn), v)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_in_vit_forward(self, rng):
        """The kernel plugs into block_forward via attention_impl."""
        from tpu_ac.models import ViTConfig, init_vit_params, vit_forward

        cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=4,
                        img_size=32)
        params = init_vit_params(0, cfg)
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
        base = vit_forward(params, imgs, cfg, taps=(1,))[1]
        fused = vit_forward(params, imgs, cfg, taps=(1,),
                            attention_impl=fused_attention)[1]
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=5e-4, atol=5e-5)


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

    def test_self_distance_zero(self, rng):
        z = rng.standard_normal((12, 32)).astype(np.float32)
        got = np.asarray(min_dists_to_sets(jnp.asarray(z),
                                           jnp.asarray(z[None]), d_tile=128))
        # mm-formulation cancellation: d2 ~ 1e-6 -> sqrt ~ 1e-3 (torch's
        # cdist mm path and FAISS share this floor)
        np.testing.assert_allclose(got[0], 0.0, atol=5e-3)


class TestAlphaWithKernel:
    def test_alpha_kernel_path_matches_xla_path(self, rng):
        """weight_distance via the kernel == the XLA formulation."""
        from tpu_ac.cluster.alpha import weight_distance_unsupervised

        Z = rng.standard_normal((6, 16, 64)).astype(np.float32)
        zj = jnp.asarray(Z)
        want = np.asarray(weight_distance_unsupervised(zj))
        n = Z.shape[0]
        got = np.stack([
            np.asarray(min_dists_to_sets(zj[i], zj, d_tile=128)).sum(0) / (n - 1)
            for i in range(n)
        ])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
