"""ViT forward parity vs the torch oracle, on small configs."""

import dataclasses

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tpu_ac.models import (
    ViTConfig,
    init_vit_params,
    vit_forward,
    vit_cls_forward,
    vit_intermediate_layers,
)
from tests.torch_ref import torch_vit_blocks

TINY = ViTConfig(patch_size=8, embed_dim=64, depth=4, num_heads=4, img_size=32)


@pytest.fixture(scope="module")
def tiny_params():
    return init_vit_params(0, TINY)


class TestViTParity:
    def test_block_outputs_match_torch(self, tiny_params, rng):
        imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        taps = (1, 3)
        got = vit_forward(tiny_params, jnp.asarray(imgs), TINY, taps=taps)
        want = torch_vit_blocks(tiny_params, imgs, TINY, taps)
        for t in taps:
            np.testing.assert_allclose(np.asarray(got[t]), want[t],
                                       rtol=2e-4, atol=2e-5)

    def test_pos_embed_interpolation_path(self, tiny_params, rng):
        # 48x48 input on a 32-trained model exercises the bicubic resize.
        imgs = rng.standard_normal((1, 3, 48, 48)).astype(np.float32)
        got = vit_forward(tiny_params, jnp.asarray(imgs), TINY, taps=(3,))
        want = torch_vit_blocks(tiny_params, imgs, TINY, (3,))
        assert got[3].shape == want[3].shape == (1, 37, 64)
        np.testing.assert_allclose(np.asarray(got[3]), want[3],
                                   rtol=2e-4, atol=5e-5)

    def test_forward_stops_at_deepest_tap(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
        outs = vit_forward(tiny_params, imgs, TINY, taps=(1,))
        assert set(outs) == {1, -1}

    def test_cls_forward_shape(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
        cls = vit_cls_forward(tiny_params, imgs, TINY)
        assert cls.shape == (2, 64)

    def test_intermediate_layers_normed(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
        outs = vit_intermediate_layers(tiny_params, imgs, TINY, n=2)
        assert len(outs) == 2 and outs[0].shape == (1, 17, 64)


class TestConversion:
    def test_torch_roundtrip(self, tiny_params):
        from tpu_ac.models.convert import (
            params_to_torch_state_dict,
            torch_state_dict_to_params,
        )
        sd = params_to_torch_state_dict(tiny_params)
        back = torch_state_dict_to_params(sd)
        for k, v in tiny_params.items():
            np.testing.assert_array_equal(np.asarray(v), np.asarray(back[k]))

    def test_prefix_stripping(self):
        from tpu_ac.models.convert import strip_prefixes
        sd = {"module.backbone.blocks.0.norm1.weight": 1,
              "backbone.cls_token": 2, "pos_embed": 3}
        out = strip_prefixes(sd)
        assert set(out) == {"blocks.0.norm1.weight", "cls_token", "pos_embed"}


class TestRegistry:
    def test_random_init_fallback(self):
        from tpu_ac.models import load_backbone
        params, cfg, family = load_backbone("dino_deitsmall16")
        assert family == "vit" and cfg.embed_dim == 384 and cfg.patch_size == 16
        assert "blocks.11.attn.qkv.weight" in params

    def test_unknown_name_raises(self):
        from tpu_ac.models import load_backbone
        with pytest.raises(KeyError):
            load_backbone("not_a_backbone")


class TestDinoHead:
    def test_head_matches_torch_weight_norm(self, rng):
        from tpu_ac.models import init_dino_head_params, dino_head_forward
        p = init_dino_head_params(0, in_dim=64, out_dim=128, hidden_dim=96,
                                  bottleneck_dim=32)
        # Make weight_g nontrivial to exercise the weight-norm math.
        p = dict(p)
        p["last_layer.weight_g"] = jnp.asarray(
            rng.uniform(0.5, 2.0, size=(128, 1)).astype(np.float32))
        x = rng.standard_normal((5, 64)).astype(np.float32)
        got = np.asarray(dino_head_forward(p, jnp.asarray(x)))

        xt = torch.from_numpy(x)
        h = xt
        for li in range(3):
            # torch Sequential keys: Linears at 0/2/4
            w = torch.from_numpy(np.asarray(p[f"mlp.{2 * li}.weight"]))
            b = torch.from_numpy(np.asarray(p[f"mlp.{2 * li}.bias"]))
            h = torch.nn.functional.linear(h, w, b)
            if li < 2:
                h = torch.nn.functional.gelu(h)
        h = torch.nn.functional.normalize(h, dim=-1, p=2)
        wv = torch.from_numpy(np.asarray(p["last_layer.weight_v"]))
        wg = torch.from_numpy(np.asarray(p["last_layer.weight_g"]))
        w = wg * wv / wv.norm(dim=1, keepdim=True)
        want = (h @ w.T).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestScanBlocks:
    def test_scan_matches_unrolled(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
        plain = vit_forward(tiny_params, imgs, TINY, taps=(2, 3))
        scanned = vit_forward(tiny_params, imgs, TINY, taps=(2, 3),
                              scan_blocks=True)
        for k in (2, 3, -1):
            np.testing.assert_allclose(np.asarray(scanned[k]),
                                       np.asarray(plain[k]),
                                       rtol=1e-5, atol=1e-6)

    def test_scan_no_taps(self, tiny_params, rng):
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
        plain = vit_forward(tiny_params, imgs, TINY, max_depth=4)
        scanned = vit_forward(tiny_params, imgs, TINY, max_depth=4,
                              scan_blocks=True)
        np.testing.assert_allclose(np.asarray(scanned[-1]),
                                   np.asarray(plain[-1]),
                                   rtol=1e-5, atol=1e-6)

    def test_scan_with_remat_gradients(self, tiny_params, rng):
        import jax
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))

        def loss(params, scan_blocks, remat):
            out = vit_forward(params, imgs, TINY, taps=(3,),
                              scan_blocks=scan_blocks, remat=remat)
            return jnp.sum(out[3] ** 2)

        g_plain = jax.grad(loss)(tiny_params, False, False)
        g_scan = jax.grad(loss)(tiny_params, True, True)
        # "dots" policy: matmul outputs saved, elementwise chain recomputed
        g_dots = jax.grad(loss)(tiny_params, True, "dots")
        for k in ("blocks.0.attn.qkv.weight", "blocks.2.mlp.fc1.weight",
                  "patch_embed.proj.weight"):
            np.testing.assert_allclose(np.asarray(g_scan[k]),
                                       np.asarray(g_plain[k]),
                                       rtol=5e-4, atol=1e-6)
            np.testing.assert_allclose(np.asarray(g_dots[k]),
                                       np.asarray(g_plain[k]),
                                       rtol=5e-4, atol=1e-6)


class TestSelfAttentionAccessors:
    def test_index_attention_matches_last(self, tiny_params, rng):
        from tpu_ac.models.vit import vit_selfattention, vit_last_selfattention
        imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
        a_idx = vit_selfattention(tiny_params, imgs, TINY, TINY.depth - 1)
        a_last = vit_last_selfattention(tiny_params, imgs, TINY)
        np.testing.assert_allclose(np.asarray(a_idx), np.asarray(a_last),
                                   rtol=1e-6)
        a0 = vit_selfattention(tiny_params, imgs, TINY, 0)
        assert a0.shape == (1, TINY.num_heads, 17, 17)
        np.testing.assert_allclose(np.asarray(a0).sum(-1), 1.0, rtol=1e-5)


class TestValidateParams:
    def test_validation_uses_architecture_not_cached_checkpoint(
            self, monkeypatch, tmp_path):
        """validate_params_against_backbone must compare against the
        architecture's own init even when a (possibly wrong) checkpoint
        sits in the default cache — otherwise the report compares the
        checkpoint with itself and is vacuously clean."""
        import torch

        from tpu_ac.models import registry
        from tpu_ac.models.convert import validate_params_against_backbone
        from tpu_ac.models.registry import BackboneSpec, register_backbone
        from tpu_ac.models.vit import ViTConfig

        register_backbone("tiny_validate", BackboneSpec(
            "vit", ViTConfig(patch_size=8, embed_dim=32, depth=1,
                             num_heads=2, img_size=32),
            "tiny_validate.pth"))
        # plant a BOGUS checkpoint under the (patched) default cache dir
        bogus = {"totally.wrong.key": torch.zeros(3)}
        torch.save(bogus, tmp_path / "tiny_validate.pth")
        monkeypatch.setattr(registry, "_DEFAULT_CKPT_DIRS",
                            (str(tmp_path),))
        report = validate_params_against_backbone(
            {"totally.wrong.key": np.zeros(3)}, "tiny_validate")
        # the bogus keys must be flagged against the REAL structure
        assert "totally.wrong.key" in report["unexpected"]
        assert "cls_token" in report["missing"]
