"""Parity tests against the ACTUAL reference implementation.

Unlike tests/torch_ref.py (an independent torch re-implementation), these
tests import the reference's own modules from /root/reference and use them
as the oracle, so a shared misreading of the reference cannot slip through:

- ``patchcore.vision_transformer`` (VisionTransformer,
  get_intermediate_layers) — vs tpu_ac.models.vit
- ``patchcore.utils`` (Matrix_Alpha_{Un,S}upervised, Weight_Distance_*) —
  vs tpu_ac.cluster.alpha
- ``patchcore.common`` (Preprocessing/MeanMapper/Aggregator,
  NetworkFeatureAggregator) — vs tpu_ac.ops.pooling /
  tpu_ac.features.embedding
- ``patchcore.patchcore`` (AnomalyClusteringCore._embed, PatchMaker) — vs
  tpu_ac.features.embedding.embed_vit_features

The reference modules only need torch/scipy/PIL/matplotlib; ``timm``,
``torchvision`` and ``faiss`` are absent in this environment and are
satisfied with import-time stubs (none of their functionality is exercised
by the code paths under test).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF_MODELS_DIR = "/root/reference/Anomaly-Clustering/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF_MODELS_DIR, "patchcore")),
    reason="reference tree not mounted")


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference `patchcore` package with dependency stubs."""
    _stub_module("timm")
    _stub_module("faiss", omp_set_num_threads=lambda n: None,
                 GpuClonerOptions=object, IndexFlatL2=object)
    _stub_module("torchvision")
    _stub_module("torchvision.models")
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    if _REF_MODELS_DIR not in sys.path:
        sys.path.insert(0, _REF_MODELS_DIR)
    import patchcore.common as ref_common  # noqa: F401
    import patchcore.patchcore as ref_patchcore
    import patchcore.utils as ref_utils
    import patchcore.vision_transformer as ref_vits

    return types.SimpleNamespace(common=ref_common, patchcore=ref_patchcore,
                                 utils=ref_utils, vits=ref_vits)


def _to_jax_params(module: "torch.nn.Module"):
    from tpu_ac.models.convert import torch_state_dict_to_params

    return torch_state_dict_to_params(
        {k: v for k, v in module.state_dict().items()})


# ---------------------------------------------------------------------------
# ViT trunk
# ---------------------------------------------------------------------------

@pytest.fixture()
def ref_vit(ref):
    # function-scoped: NetworkFeatureAggregator registers forward hooks on
    # the backbone whose last hook ABORTS the forward (common.py:262-268) —
    # a shared instance would poison later full-forward tests.
    torch.manual_seed(0)
    model = ref.vits.vit_tiny(patch_size=16)
    model.eval()
    return model


def _our_vit_cfg():
    from tpu_ac.models.vit import ViTConfig

    return ViTConfig(patch_size=16, embed_dim=192, depth=12, num_heads=3)


def test_vit_get_intermediate_layers_parity(ref_vit):
    """vs VisionTransformer.get_intermediate_layers
    (reference vision_transformer.py:225-233)."""
    rng = np.random.default_rng(11)
    from tpu_ac.models.vit import vit_intermediate_layers

    imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref_vit.get_intermediate_layers(torch.from_numpy(imgs), n=2)
    params = _to_jax_params(ref_vit)
    got = vit_intermediate_layers(params, imgs, _our_vit_cfg(), n=2)
    assert len(want) == len(got) == 2
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_vit_block_taps_match_reference_hooks(ref, ref_vit):
    """Our tap-returning forward vs NetworkFeatureAggregator forward hooks
    (reference common.py:211-274) on blocks.2/blocks.3."""
    rng = np.random.default_rng(12)
    from tpu_ac.models.vit import vit_forward

    agg = ref.common.NetworkFeatureAggregator(
        ref_vit, ["blocks.2", "blocks.3"], torch.device("cpu"))
    imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = agg(torch.from_numpy(imgs))
    params = _to_jax_params(ref_vit)
    outs = vit_forward(params, imgs, _our_vit_cfg(), taps=(2, 3))
    for idx, name in ((2, "blocks.2"), (3, "blocks.3")):
        np.testing.assert_allclose(np.asarray(outs[idx]),
                                   want[name].numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_vit_last_selfattention_parity(ref_vit):
    rng = np.random.default_rng(13)
    from tpu_ac.models.vit import vit_last_selfattention

    imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref_vit.get_last_selfattention(torch.from_numpy(imgs))
    got = vit_last_selfattention(_to_jax_params(ref_vit), imgs,
                                 _our_vit_cfg())
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("hw", [(96, 96), (64, 96), (96, 64)])
def test_vit_pos_embed_interpolation_parity(ref_vit, hw):
    """Non-pretrain image size exercises interpolate_pos_encoding's bicubic
    resize + 0.1 fudge (reference vision_transformer.py:174-194).  The
    NON-SQUARE cases pin the axis orientation: the row scale must come
    from the image height (the reference passes shape[2] through a
    variable it calls 'w') — a transposed pos-embed matches on squares
    and silently corrupts every rectangular input."""
    rng = np.random.default_rng(14)
    from tpu_ac.models.vit import vit_intermediate_layers

    h, w = hw
    imgs = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        want = ref_vit.get_intermediate_layers(torch.from_numpy(imgs), n=1)[0]
    got = vit_intermediate_layers(_to_jax_params(ref_vit), imgs,
                                  _our_vit_cfg(), n=1)[0]
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Alpha math
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tau", [0.0, 1.0, 2.0])
def test_matrix_alpha_unsupervised_parity(ref, tau):
    rng = np.random.default_rng(15)
    from tpu_ac.cluster.alpha import matrix_alpha_unsupervised

    Z = rng.standard_normal((6, 32, 8)).astype(np.float32)
    want = ref.utils.Matrix_Alpha_Unsupervised(
        tau, 1, torch.from_numpy(Z), torch.device("cpu")).numpy()
    got = np.asarray(matrix_alpha_unsupervised(tau, 1.0, Z))
    # fp32 matmul-expansion distance noise propagates through exp/normalize;
    # torch.cdist itself takes the mm path at the workload's P (>25).
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=2e-5)


@pytest.mark.parametrize("tau", [0.0, 1.0, 2.0])
def test_matrix_alpha_supervised_parity(ref, tau):
    rng = np.random.default_rng(16)
    from tpu_ac.cluster.alpha import matrix_alpha_supervised

    Z = rng.standard_normal((5, 32, 8)).astype(np.float32)
    Zt = rng.standard_normal((3, 32, 8)).astype(np.float32)
    want = ref.utils.Matrix_Alpha_Supervised(
        tau, 1, torch.from_numpy(Z), torch.from_numpy(Zt),
        torch.device("cpu")).numpy()
    got = np.asarray(matrix_alpha_supervised(tau, 1.0, Z, Zt))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=2e-5)


def test_weight_distance_parity(ref):
    rng = np.random.default_rng(17)
    from tpu_ac.cluster.alpha import (
        weight_distance_supervised,
        weight_distance_unsupervised,
    )

    Z = rng.standard_normal((4, 32, 6)).astype(np.float32)
    Zt = rng.standard_normal((3, 32, 6)).astype(np.float32)
    dev = torch.device("cpu")
    want_u = np.stack([
        ref.utils.Weight_Distance_Unsupervised(
            torch.from_numpy(Z), i, dev).numpy()
        for i in range(Z.shape[0])])
    np.testing.assert_allclose(
        np.asarray(weight_distance_unsupervised(Z)), want_u,
        rtol=5e-4, atol=5e-4)
    want_s = np.stack([
        ref.utils.Weight_Distance_Supervised(
            torch.from_numpy(Z), torch.from_numpy(Zt), i, dev).numpy()
        for i in range(Z.shape[0])])
    np.testing.assert_allclose(
        np.asarray(weight_distance_supervised(Z, Zt)), want_s,
        rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Preprocessing / Aggregator / PatchMaker
# ---------------------------------------------------------------------------

def test_patchify_parity(ref):
    rng = np.random.default_rng(18)
    from tpu_ac.ops.pooling import patchify

    x = rng.standard_normal((2, 5, 7, 7)).astype(np.float32)
    maker = ref.patchcore.PatchMaker(3, stride=1)
    want, want_grid = maker.patchify(torch.from_numpy(x),
                                     return_spatial_info=True)
    got, grid = patchify(x, 3, 1)
    assert tuple(want_grid) == grid
    # reference returns [B*P, C, k, k]-foldable [B, P, C, k, k]
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_preprocessing_aggregator_parity(ref):
    """MeanMapper/Preprocessing/Aggregator (reference common.py:145-183) vs
    our adaptive-pool matmul path on the same per-layer patch features."""
    rng = np.random.default_rng(19)
    from tpu_ac.features.embedding import EmbedConfig, aggregate_layer_patches

    b, p = 3, 4
    feats = [rng.standard_normal((b * p, 24, 3, 3)).astype(np.float32),
             rng.standard_normal((b * p, 40, 3, 3)).astype(np.float32)]
    pre = ref.common.Preprocessing([24, 40], 32)
    agg = ref.common.Aggregator(target_dim=48)
    with torch.no_grad():
        want = agg(pre([torch.from_numpy(f) for f in feats])).numpy()
    cfg = EmbedConfig(layers=("blocks.0", "blocks.1"),
                      pretrain_embed_dimension=32, target_embed_dimension=48)
    ours_in = [f.reshape(b, p, *f.shape[1:]) for f in feats]
    got = np.asarray(aggregate_layer_patches(ours_in, cfg))
    np.testing.assert_allclose(got.reshape(b * p, 48), want,
                               rtol=1e-5, atol=1e-6)


def test_adaptive_avg_pool1d_parity(ref):
    rng = np.random.default_rng(20)
    import torch.nn.functional as F

    from tpu_ac.ops.pooling import adaptive_avg_pool1d

    for length, out in [(100, 32), (360, 283), (55, 55), (9, 16)]:
        x = rng.standard_normal((2, length)).astype(np.float32)
        want = F.adaptive_avg_pool1d(
            torch.from_numpy(x).unsqueeze(1), out).squeeze(1).numpy()
        for use_matmul in (False, True):
            got = np.asarray(adaptive_avg_pool1d(x, out,
                                                 use_matmul=use_matmul))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Full _embed pipeline
# ---------------------------------------------------------------------------

def test_full_embed_parity_vs_reference_core(ref, ref_vit):
    """AnomalyClusteringCore._embed (reference patchcore.py:355-431) vs
    embed_vit_features on the same weights/images."""
    rng = np.random.default_rng(21)
    from tpu_ac.features.embedding import EmbedConfig, embed_vit_features

    core = ref.patchcore.AnomalyClusteringCore(torch.device("cpu"))
    core.load(
        backbone=ref_vit,
        layers_to_extract_from=["blocks.2", "blocks.3"],
        device=torch.device("cpu"),
        input_shape=(3, 64, 64),
        pretrain_embed_dimension=96,
        target_embed_dimension=128,
        patchsize=3,
        patchstride=1,
    )
    imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    torch.manual_seed(0)  # the ad-hoc LayerNorm is constructed per call
    want = np.stack(core._embed(torch.from_numpy(imgs), "unsupervised"))

    params = _to_jax_params(ref_vit)
    ecfg = EmbedConfig(layers=("blocks.2", "blocks.3"),
                       pretrain_embed_dimension=96,
                       target_embed_dimension=128)
    got = np.asarray(embed_vit_features(params, imgs, _our_vit_cfg(), ecfg))
    np.testing.assert_allclose(got.reshape(-1, 128), want.reshape(-1, 128),
                               rtol=5e-4, atol=5e-4)
