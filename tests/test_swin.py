"""Swin Transformer invariants + registry/embedding integration.

No timm in this environment, so the defining mechanics are tested as
invariants: window partition/reverse round-trip, strict within-window
locality of an unshifted block, cross-window flow under shift, the
shifted-window attention mask, PatchMerging's 2x2 checkerboard order, and
the relative-position index structure.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ac.models.swin import (
    SWIN_BASE,
    SWIN_LARGE,
    SwinConfig,
    _patch_merging,
    _swin_block,
    _window_partition,
    _window_reverse,
    init_swin_params,
    relative_position_index,
    shifted_window_mask,
    swin_forward,
)

MICRO = SwinConfig(patch_size=4, window_size=4, embed_dim=16,
                   depths=(1, 2, 1), num_heads=(2, 2, 2))


@pytest.fixture(scope="module")
def micro_params():
    return init_swin_params(0, MICRO)


class TestWindowMechanics:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(
            np.float32))
        back = _window_reverse(_window_partition(x, 4), 4, 8, 12)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        idx = relative_position_index(7)
        assert idx.shape == (49, 49)
        assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
        # self-relation maps every token to the same (center) table entry
        assert len(set(np.diag(idx).tolist())) == 1
        # relation (i, j) and (j, i) are mirrored, not equal in general
        assert idx[0, 1] != idx[1, 0]

    def test_shifted_mask_blocks_cross_region(self):
        mask = shifted_window_mask(8, 8, 4, 2)
        assert mask.shape == (4, 16, 16)
        # the top-left window is one contiguous region: fully unmasked
        np.testing.assert_array_equal(mask[0], 0.0)
        # the bottom-right window mixes 4 rolled regions: has -100 entries
        assert (mask[-1] == -100.0).any()
        # mask is symmetric in its zero pattern
        np.testing.assert_array_equal(mask[-1] == 0, mask[-1].T == 0)


class TestBlockLocality:
    def test_unshifted_block_is_window_local(self, micro_params, rng):
        x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
        x2 = x.copy()
        x2[0, 0, 0, 3] += 2.0  # inside window (0,0)
        args = dict(nh=2, w=4, cfg=MICRO,
                    precision=jax.lax.Precision.HIGHEST)
        a = np.asarray(_swin_block(micro_params, "layers.0.blocks.0.",
                                   jnp.asarray(x), shift=0, **args))
        b = np.asarray(_swin_block(micro_params, "layers.0.blocks.0.",
                                   jnp.asarray(x2), shift=0, **args))
        diff = np.abs(a - b).max(axis=-1)[0]
        assert diff[:4, :4].max() > 0
        assert diff[4:, :].max() == 0 and diff[:, 4:].max() == 0

    def test_shifted_block_crosses_windows(self, micro_params, rng):
        x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
        x2 = x.copy()
        x2[0, 3, 3, 3] += 2.0
        args = dict(nh=2, w=4, cfg=MICRO,
                    precision=jax.lax.Precision.HIGHEST)
        a = np.asarray(_swin_block(micro_params, "layers.0.blocks.0.",
                                   jnp.asarray(x), shift=2, **args))
        b = np.asarray(_swin_block(micro_params, "layers.0.blocks.0.",
                                   jnp.asarray(x2), shift=2, **args))
        diff = np.abs(a - b).max(axis=-1)[0]
        # after rolling by 2, token (3,3) sits in a window that spans the
        # original window boundary: influence crosses into (4:, 4:)-land
        assert diff[4:6, 4:6].max() > 0

    def test_patch_merging_checkerboard(self, micro_params, rng):
        x = rng.standard_normal((1, 4, 4, 16)).astype(np.float32)
        out = _patch_merging(micro_params, "layers.0.downsample.",
                             jnp.asarray(x), MICRO,
                             jax.lax.Precision.HIGHEST)
        assert out.shape == (1, 2, 2, 32)
        # manual: cat(x[0::2,0::2], x[1::2,0::2], x[0::2,1::2],
        # x[1::2,1::2]) -> norm -> reduction
        from tpu_ac.ops.normalize import layernorm

        cat = np.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                              x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        y = layernorm(jnp.asarray(cat),
                      micro_params["layers.0.downsample.norm.weight"],
                      micro_params["layers.0.downsample.norm.bias"],
                      MICRO.ln_eps)
        want = np.asarray(y) @ np.asarray(
            micro_params["layers.0.downsample.reduction.weight"]).T
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4,
                                   atol=1e-5)


class TestSwinForward:
    def test_tap_shapes_and_early_abort(self, micro_params, rng):
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        outs = swin_forward(micro_params, x, MICRO,
                            taps=("layers.0", "layers.1"))
        assert outs["layers.0"].shape == (2, 16, 16, 16)
        assert outs["layers.1"].shape == (2, 32, 8, 8)
        assert "final" not in outs  # aborted after the deepest tap

    def test_full_forward_final(self, micro_params, rng):
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        outs = swin_forward(micro_params, x, MICRO)
        assert outs["final"].shape == (1, 64, 4, 4)
        assert np.isfinite(np.asarray(outs["final"])).all()

    def test_registry_configs(self):
        from tpu_ac.models.registry import BACKBONE_CONFIGS

        assert BACKBONE_CONFIGS["vit_swin_base"].config == SWIN_BASE
        assert BACKBONE_CONFIGS["vit_swin_large"].config == SWIN_LARGE
        assert SWIN_BASE.stage_dims == (128, 256, 512, 1024)
        assert SWIN_LARGE.stage_dims == (192, 384, 768, 1536)

    def test_family_embed_path(self, micro_params, rng):
        from tpu_ac.features.embedding import EmbedConfig, embed_features

        ecfg = EmbedConfig(layers=("layers.1", "layers.2"),
                           pretrain_embed_dimension=24,
                           target_embed_dimension=48)
        x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        z = embed_features("swin", micro_params, x, MICRO, ecfg)
        # ref grid = the first tapped layer's grid: 8x8 = 64 patches
        assert z.shape == (2, 64, 48)
        assert np.isfinite(np.asarray(z)).all()


class TestShiftDisableRule:
    def test_single_window_stage_attends_unshifted(self, micro_params, rng):
        """Upstream Swin sets shift_size=0 when min(grid) <= window_size;
        at 32px MICRO's stage 1 grid is 4x4 == window, so its odd block
        must equal an explicit shift=0 block (and differ from shift=2)."""
        x32 = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        out = swin_forward(micro_params, jnp.asarray(x32), MICRO,
                           taps=("layers.1",))["layers.1"]

        # replay the forward manually with explicit shifts
        def manual(shift_for_odd):
            from tpu_ac.models.swin import layernorm

            p = micro_params
            y = jax.lax.conv_general_dilated(
                jnp.asarray(x32), p["patch_embed.proj.weight"],
                window_strides=(4, 4), padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            y = y + p["patch_embed.proj.bias"][None, :, None, None]
            y = y.transpose(0, 2, 3, 1)
            y = layernorm(y, p["patch_embed.norm.weight"],
                          p["patch_embed.norm.bias"], MICRO.ln_eps)
            y = _swin_block(p, "layers.0.blocks.0.", y, 2, 4, 0, MICRO,
                            jax.lax.Precision.HIGHEST)
            y = _patch_merging(p, "layers.0.downsample.", y, MICRO,
                               jax.lax.Precision.HIGHEST)
            y = _swin_block(p, "layers.1.blocks.0.", y, 2, 4, 0, MICRO,
                            jax.lax.Precision.HIGHEST)
            y = _swin_block(p, "layers.1.blocks.1.", y, 2, 4,
                            shift_for_odd, MICRO,
                            jax.lax.Precision.HIGHEST)
            return y.transpose(0, 3, 1, 2)

        np.testing.assert_allclose(np.asarray(out), np.asarray(manual(0)),
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(np.asarray(out) - np.asarray(manual(2))).max() > 1e-4
