"""XCiT architecture invariants + registry/embedding integration.

No xcit source or weights exist in this environment (the reference hub-
loads facebookresearch/xcit), so these tests check the architecture's
defining invariants instead of a torch oracle: channel-softmax rows,
token-permutation equivariance of XCA, LPI's 5x5 receptive field, the
class-attention CLS-only query, and the official residual-doubling quirk.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ac.models.xcit import (
    XCIT_SMALL_12_P16,
    XCiTConfig,
    cls_attn_block,
    init_xcit_params,
    positional_encoding_fourier,
    xca,
    xcit_cls_forward,
    xcit_forward,
)

TINY = XCiTConfig(patch_size=8, embed_dim=32, depth=3, num_heads=4,
                  cls_attn_layers=2)


@pytest.fixture(scope="module")
def tiny_params():
    return init_xcit_params(0, TINY)


class TestXCiTForward:
    def test_cls_forward_shape(self, tiny_params, rng):
        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        out = xcit_cls_forward(tiny_params, x, TINY)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_tap_shapes(self, tiny_params, rng):
        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        outs = xcit_forward(tiny_params, x, TINY, taps=(1, 2))
        # 32px / patch 8 -> 4x4 = 16 tokens, no CLS in the trunk
        assert outs[1].shape == (2, 16, 32)
        assert outs[2].shape == (2, 16, 32)

    def test_full_size_config_registry(self):
        from tpu_ac.models.registry import load_backbone

        params, cfg, family = load_backbone("dino_xcit_small_12_p16")
        assert family == "xcit"
        assert cfg == XCIT_SMALL_12_P16
        x = np.zeros((1, 3, 32, 32), np.float32)
        out = xcit_cls_forward(params, x, cfg)
        assert out.shape == (1, 384)

    def test_pos_encoding_shape_and_projection(self, tiny_params):
        pos = positional_encoding_fourier(tiny_params, 4, 4, TINY)
        assert pos.shape == (1, 16, 32)
        # different grid sites get different encodings
        p = np.asarray(pos[0])
        assert np.abs(p[0] - p[5]).max() > 1e-4


class TestXCAInvariants:
    def test_token_permutation_equivariance(self, tiny_params, rng):
        """Channel attention has no positional structure: permuting tokens
        permutes the outputs identically."""
        x = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
        perm = np.asarray(rng.permutation(16))
        out = np.asarray(xca(tiny_params, "blocks.0.", x, TINY,
                             jax.lax.Precision.HIGHEST))
        out_p = np.asarray(xca(tiny_params, "blocks.0.", x[:, perm], TINY,
                               jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(out_p, out[:, perm], rtol=1e-4,
                                   atol=1e-5)

    def test_temperature_scales_attention(self, tiny_params, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
        hot = dict(tiny_params)
        hot["blocks.0.attn.temperature"] = (
            tiny_params["blocks.0.attn.temperature"] * 50.0)
        a = np.asarray(xca(tiny_params, "blocks.0.", x, TINY,
                           jax.lax.Precision.HIGHEST))
        b = np.asarray(xca(hot, "blocks.0.", x, TINY,
                           jax.lax.Precision.HIGHEST))
        assert np.abs(a - b).max() > 1e-4

    def test_lpi_receptive_field(self, tiny_params, rng):
        """Two depthwise 3x3 convs -> a perturbation at grid site (0,0)
        cannot reach sites beyond L_inf distance 2."""
        from tpu_ac.models.xcit import lpi

        x = rng.standard_normal((1, 16, 32)).astype(np.float32)
        x2 = x.copy()
        x2[0, 0] += 1.0  # token (0, 0) of the 4x4 grid
        a = np.asarray(lpi(tiny_params, "blocks.0.", jnp.asarray(x), 4, 4,
                           TINY, jax.lax.Precision.HIGHEST))
        b = np.asarray(lpi(tiny_params, "blocks.0.", jnp.asarray(x2), 4, 4,
                           TINY, jax.lax.Precision.HIGHEST))
        diff = np.abs(a - b).max(axis=-1)[0].reshape(4, 4)
        assert diff[:3, :3].max() > 0  # inside the 5x5 window
        assert diff[3, 3] == 0         # L_inf distance 3: untouched


class TestClassAttention:
    def test_patch_tokens_double_quirk(self, tiny_params, rng):
        """The official block returns x_res + cat(mlp(cls), patches), so
        patch tokens exactly double (kept for checkpoint fidelity)."""
        from tpu_ac.ops.normalize import layernorm

        x = jnp.asarray(rng.standard_normal((1, 17, 32)).astype(np.float32))
        out = cls_attn_block(tiny_params, 0, x, TINY,
                             jax.lax.Precision.HIGHEST)
        pre = "cls_attn_blocks.0."
        y = layernorm(x, tiny_params[pre + "norm1.weight"],
                      tiny_params[pre + "norm1.bias"], TINY.ln_eps)
        from tpu_ac.models.xcit import class_attention

        after_attn = x + tiny_params[pre + "gamma1"] * class_attention(
            tiny_params, pre, y, TINY, jax.lax.Precision.HIGHEST)
        after_norm = layernorm(after_attn,
                               tiny_params[pre + "norm2.weight"],
                               tiny_params[pre + "norm2.bias"], TINY.ln_eps)
        np.testing.assert_allclose(np.asarray(out[:, 1:]),
                                   2 * np.asarray(after_norm[:, 1:]),
                                   rtol=1e-4, atol=1e-5)

    def test_patch_change_far_from_cls_only_via_attn(self, tiny_params,
                                                     rng):
        """Patch tokens influence the CLS output (they are keys/values)."""
        x = rng.standard_normal((1, 17, 32)).astype(np.float32)
        x2 = x.copy()
        # single-dim perturbation: a constant shift of the whole token
        # would be annihilated by the block's LayerNorm
        x2[0, 9, 3] += 2.0
        a = np.asarray(cls_attn_block(tiny_params, 0, jnp.asarray(x), TINY,
                                      jax.lax.Precision.HIGHEST))
        b = np.asarray(cls_attn_block(tiny_params, 0, jnp.asarray(x2), TINY,
                                      jax.lax.Precision.HIGHEST))
        assert np.abs(a[0, 0] - b[0, 0]).max() > 1e-5


class TestXCiTEmbedding:
    def test_family_embed_path(self, tiny_params, rng):
        from tpu_ac.features.embedding import EmbedConfig, embed_features

        ecfg = EmbedConfig(layers=("blocks.1", "blocks.2"),
                           pretrain_embed_dimension=24,
                           target_embed_dimension=48)
        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        z = embed_features("xcit", tiny_params, x, TINY, ecfg)
        assert z.shape == (2, 16, 48)
        assert np.isfinite(np.asarray(z)).all()

    def test_clustering_cli_dispatches_xcit(self, rng, tmp_path):
        """The stage-1 CLI runs end-to-end on an xcit backbone."""
        from tpu_ac.cli.main import main as cli_main
        from tpu_ac.data import make_synthetic_mvtec
        from tpu_ac.models.registry import register_backbone, BackboneSpec

        root = str(tmp_path / "mvtec")
        make_synthetic_mvtec(root, image_size=64)
        register_backbone("tiny_xcit", BackboneSpec("xcit", TINY, None))
        out = str(tmp_path / "out")
        cli_main(["--path", root, "--backbone_names", "tiny_xcit",
                  "--layers_to_extract_from", "blocks.1", "blocks.2",
                  "--pretrain_embed_dimension", "24",
                  "--target_embed_dimension", "48",
                  "--output_dir", out, "--categories", "bottle",
                  "--supervised", "unsupervised", "--batch_size", "4"])
        import os

        found = [f for r, _, fs in os.walk(out) for f in fs
                 if f.endswith(".pickle")]
        assert found


class TestHubXCiT:
    def test_hub_factories(self):
        import tpu_ac.hub as hub

        for fn, dim in ((hub.dino_xcit_small_12_p16, 384),
                        (hub.dino_xcit_medium_24_p16, 512)):
            params, cfg, family = fn()
            assert family == "xcit" and cfg.embed_dim == dim
            assert f"blocks.{cfg.depth - 1}.attn.qkv.weight" in params
