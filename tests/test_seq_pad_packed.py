"""Coverage for the round-3 perf plumbing: masked sequence padding
(vit_forward(seq_pad=True)), the packed single-fetch alpha+X output, and
the flash-attention wrapper's mask/head-dim handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_vit():
    from tpu_ac.models.vit import ViTConfig, init_vit_params

    # 40/8 = 5 -> 26 tokens, padded to 128 under seq_pad
    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=3, num_heads=4,
                    img_size=40)
    return cfg, init_vit_params(0, cfg)


class TestSeqPad:
    def test_tapped_outputs_exact(self, rng, tiny_vit):
        """seq_pad pads tokens to a 128 multiple with masked attention —
        real-token outputs must be EXACTLY those of the unpadded forward
        (up to f32 reassociation) and shapes sliced back."""
        from tpu_ac.models.vit import vit_forward

        cfg, params = tiny_vit
        imgs = jnp.asarray(rng.standard_normal((2, 3, 40, 40)), jnp.float32)
        ref = vit_forward(params, imgs, cfg, taps=(1, 2))
        pad = vit_forward(params, imgs, cfg, taps=(1, 2), seq_pad=True)
        for t in (1, 2, -1):
            assert pad[t].shape == ref[t].shape  # sliced back to 26 tokens
            np.testing.assert_allclose(np.asarray(pad[t]), np.asarray(ref[t]),
                                       rtol=2e-5, atol=2e-6)

    def test_scan_blocks_branch_exact(self, rng, tiny_vit):
        from tpu_ac.models.vit import vit_forward

        cfg, params = tiny_vit
        imgs = jnp.asarray(rng.standard_normal((2, 3, 40, 40)), jnp.float32)
        ref = vit_forward(params, imgs, cfg, taps=(2,), scan_blocks=True)
        pad = vit_forward(params, imgs, cfg, taps=(2,), scan_blocks=True,
                          seq_pad=True)
        np.testing.assert_allclose(np.asarray(pad[2]), np.asarray(ref[2]),
                                   rtol=2e-5, atol=2e-6)

    def test_small_model_small_pad(self, rng):
        """Exactness holds at a second shape (17 tokens -> 128)."""
        from tpu_ac.models.vit import ViTConfig, init_vit_params, vit_forward

        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2,
                        img_size=32)
        params = init_vit_params(0, cfg)
        rng2 = np.random.default_rng(0)
        imgs = jnp.asarray(rng2.standard_normal((1, 3, 32, 32)), jnp.float32)
        ref = vit_forward(params, imgs, cfg, taps=(0,))
        pad = vit_forward(params, imgs, cfg, taps=(0,), seq_pad=True)
        np.testing.assert_allclose(np.asarray(pad[0]), np.asarray(ref[0]),
                                   rtol=2e-5, atol=2e-6)


class TestPackedAlphaX:
    @pytest.mark.parametrize("mode", ["unsupervised", "supervised",
                                      "average"])
    def test_packed_equals_unpacked(self, rng, mode):
        from tpu_ac.pipeline import compute_alpha_X

        Z = jnp.asarray(rng.standard_normal((5, 12, 16)), jnp.float32)
        Zt = jnp.asarray(rng.standard_normal((4, 12, 16)), jnp.float32)
        kw = {"Z_train": Zt} if mode == "supervised" else {}
        alpha, x = compute_alpha_X(Z, mode, tau=1.0, use_mesh=False, **kw)
        packed = compute_alpha_X(Z, mode, tau=1.0, use_mesh=False,
                                 packed=True, **kw)
        assert packed.shape == (5, 12 + 16)
        np.testing.assert_allclose(np.asarray(packed[:, :12]),
                                   np.asarray(alpha), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(packed[:, 12:]),
                                   np.asarray(x), rtol=1e-6)

    def test_packed_on_mesh_branch(self, rng):
        """The dp-mesh branch must honor packed=True too (it crashed the
        bench on multi-device hosts before)."""
        from tpu_ac.pipeline import compute_alpha_X

        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        Z = jnp.asarray(rng.standard_normal((8, 12, 16)), jnp.float32)
        alpha, x = compute_alpha_X(Z, "unsupervised", tau=1.0, use_mesh=True)
        packed = compute_alpha_X(Z, "unsupervised", tau=1.0, use_mesh=True,
                                 packed=True)
        np.testing.assert_allclose(np.asarray(packed[:, :12]),
                                   np.asarray(alpha), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(packed[:, 12:]),
                                   np.asarray(x), rtol=1e-6)


class TestFlashWrapperLogic:
    def test_mask_and_headdim_plumbing(self, monkeypatch, rng):
        """flash_attention_impl derives segment ids from the additive bias
        (pad tokens -> segment 1), zero-pads Dh to 128 lanes, and slices
        the kernel output back — verified by capturing the kernel call."""
        import tpu_ac.kernels.attention as attn_mod
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        captured = {}

        def fake_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
                       sm_scale=1.0, block_sizes=None, debug=False):
            captured.update(q=q, segment_ids=segment_ids,
                            sm_scale=sm_scale)
            return q  # echo: caller slices back to the original head dim

        monkeypatch.setattr(fa, "flash_attention", fake_flash)
        b, h, s, dh, n_valid = 2, 3, 256, 64, 200
        q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        bias = jnp.where(jnp.arange(s) < n_valid, 0.0,
                         -1e9)[None, None, None, :]
        out = attn_mod.flash_attention_impl(q, q, q, 0.125, bias)
        assert out.shape == (b, h, s, dh)  # Dh sliced back from 128
        assert captured["q"].shape == (b, h, s, 128)  # zero-padded lanes
        assert captured["sm_scale"] == pytest.approx(0.125)
        ids = np.asarray(captured["segment_ids"].q)
        assert ids.shape == (b, s)
        assert (ids[:, :n_valid] == 0).all() and (ids[:, n_valid:] == 1).all()
        kv = np.asarray(captured["segment_ids"].kv)
        assert (kv == ids).all()

    def test_no_bias_no_segments(self, monkeypatch, rng):
        import tpu_ac.kernels.attention as attn_mod
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        captured = {}

        def fake_flash(q, k, v, ab=None, segment_ids=None, **kw):
            captured["segment_ids"] = segment_ids
            return q

        monkeypatch.setattr(fa, "flash_attention", fake_flash)
        q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.float32)
        attn_mod.flash_attention_impl(q, q, q, 0.5, None)
        assert captured["segment_ids"] is None

    def test_per_batch_bias_rejected(self, rng):
        """Per-batch masks (and genuinely additive biases) are NOT
        representable as the kernel's batch-uniform segment-id mask —
        collapsing them silently would misattend other batch items, so the
        wrapper must reject anything but a [1, ..., 1, S] mask."""
        import tpu_ac.kernels.attention as attn_mod

        q = jnp.asarray(rng.standard_normal((2, 2, 128, 64)), jnp.float32)
        per_batch = jnp.zeros((2, 1, 1, 128))
        with pytest.raises(NotImplementedError):
            attn_mod.flash_attention_impl(q, q, q, 0.5, per_batch)
        wrong_s = jnp.zeros((1, 1, 1, 64))
        with pytest.raises(NotImplementedError):
            attn_mod.flash_attention_impl(q, q, q, 0.5, wrong_s)


class TestRaggedAttentionPad:
    def test_exactness_and_attn_shape(self, rng, tiny_vit):
        """ATTENTION_PAD_RAGGED pads q-rows/key-lanes inside attention
        only; outputs and returned attention maps must match the unpadded
        graph exactly (masked keys get zero softmax mass)."""
        import tpu_ac.models.vit as V

        cfg, params = tiny_vit
        imgs = jnp.asarray(rng.standard_normal((2, 3, 40, 40)), jnp.float32)
        old = V.ATTENTION_PAD_RAGGED
        try:
            V.ATTENTION_PAD_RAGGED = False
            ref = V.vit_forward(params, imgs, cfg, taps=(2,))
            ref_attn = V.vit_selfattention(params, imgs, cfg, block_idx=1)
            V.ATTENTION_PAD_RAGGED = True
            pad = V.vit_forward(params, imgs, cfg, taps=(2,))
            pad_attn = V.vit_selfattention(params, imgs, cfg, block_idx=1)
        finally:
            V.ATTENTION_PAD_RAGGED = old
        np.testing.assert_allclose(np.asarray(pad[2]), np.asarray(ref[2]),
                                   rtol=2e-5, atol=2e-6)
        assert pad_attn.shape == ref_attn.shape  # sliced back to [.., S, S]
        np.testing.assert_allclose(np.asarray(pad_attn),
                                   np.asarray(ref_attn),
                                   rtol=2e-5, atol=1e-7)
