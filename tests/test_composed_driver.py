"""Composed category-path oracle: the reference DRIVER vs run_category.

The piecewise oracles (test_reference_oracle.py) pin `_embed` and the
`Matrix_Alpha_*` math individually; this module pins their COMPOSITION —
the full make_category_data flow (Anomaly-Clustering/examples/main.py:
183-311) run through the reference's own imported machinery:

  reference MVTecDataset walk order (datasets/mvtec.py:115-160)
    -> serial per-image AnomalyClusteringCore._embed (batch_size=1
       dataloader, patchcore.py:330-353)
    -> supervised: shuffled train split truncated to
       int(train_ratio * len(TEST set)) — quirk #2 (examples/main.py:281)
    -> Matrix_Alpha_{Unsupervised,Supervised} / uniform "average"
       (examples/main.py:283-296)
    -> alpha.unsqueeze(1) bmm Z (examples/main.py:299-301)

against ONE call of `tpu_ac.pipeline.run_category` on the same synthetic
MVTec tree with the same (torch-converted) weights, asserting (alpha, X)
and the item ordering agree at f32 tolerance in all three modes — so
ordering / padding / seeding / truncation interaction bugs cannot slip
between the piecewise guards.

The reference's torchvision dependency is import-stubbed: the walk
(`get_image_data`) is pure os/glob, `__getitem__` is never called, and
image decoding uses tpu_ac's loader (its torchvision Resize/CenterCrop/
Normalize parity is pinned separately in test_pipeline.py).  The
reference's unseeded DataLoader(shuffle=True) (quirk #6) is replaced on
BOTH sides by the pipeline's documented seeded permutation
(np.random.default_rng(seed).permutation), which is the tpu_ac contract
(PARITY.md #6).
"""

from __future__ import annotations

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF_ROOT = "/root/reference/Anomaly-Clustering"
_REF_MODELS_DIR = os.path.join(_REF_ROOT, "models")
_REF_DATASETS_DIR = _REF_ROOT

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF_MODELS_DIR, "patchcore")),
    reason="reference tree not mounted")


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        for k, v in attrs.items():
            if not hasattr(sys.modules[name], k):
                setattr(sys.modules[name], k, v)
        return
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _StubTransform:
    """Placeholder for torchvision transforms: constructed (stored in the
    dataset's transform list) but never applied — __getitem__ is bypassed."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):  # pragma: no cover - never applied
        raise RuntimeError("stub transform must not be applied")


@pytest.fixture(scope="module")
def ref():
    """The reference patchcore package + datasets.mvtec, import-stubbed."""
    _stub_module("timm")
    _stub_module("faiss", omp_set_num_threads=lambda n: None,
                 GpuClonerOptions=object, IndexFlatL2=object)
    _stub_module("torchvision")
    _stub_module("torchvision.transforms",
                 Resize=_StubTransform, CenterCrop=_StubTransform,
                 ToTensor=_StubTransform, Normalize=_StubTransform,
                 Compose=lambda fns: fns)
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    _stub_module("torchvision.models")
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    if _REF_MODELS_DIR not in sys.path:
        sys.path.insert(0, _REF_MODELS_DIR)
    # an installed `datasets` package (HF) shadows the reference's
    # namespace dir — load its mvtec.py by file path instead
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_datasets_mvtec",
        os.path.join(_REF_DATASETS_DIR, "datasets", "mvtec.py"))
    ref_mvtec = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mvtec)
    import patchcore.patchcore as ref_patchcore
    import patchcore.utils as ref_utils
    import patchcore.vision_transformer as ref_vits

    return types.SimpleNamespace(mvtec=ref_mvtec, patchcore=ref_patchcore,
                                 utils=ref_utils, vits=ref_vits)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from tpu_ac.data import make_synthetic_mvtec

    root = str(tmp_path_factory.mktemp("mvtec_composed"))
    make_synthetic_mvtec(root, classname="bottle", image_size=64,
                         n_per_anomaly=4, n_train=6)
    return root


_LAYERS = ("blocks.2", "blocks.3")
_PRETRAIN, _TARGET = 96, 128
_RESIZE, _IMAGESIZE = 72, 64
_TAU, _TRAIN_RATIO, _SEED = 1.0, 0.25, 2023


def _reference_category_data(ref, root: str, mode: str):
    """examples/main.py:183-311 composed from the reference's own modules.

    Returns (alpha [N, P], X [N, D], image_paths in iteration order).
    """
    from tpu_ac.data.mvtec import load_image

    torch.manual_seed(0)
    ref_backbone = ref.vits.vit_tiny(patch_size=16)
    ref_backbone.eval()

    core = ref.patchcore.AnomalyClusteringCore(torch.device("cpu"))
    core.load(
        backbone=ref_backbone,
        layers_to_extract_from=list(_LAYERS),
        device=torch.device("cpu"),
        input_shape=(3, _IMAGESIZE, _IMAGESIZE),
        pretrain_embed_dimension=_PRETRAIN,
        target_embed_dimension=_TARGET,
        patchsize=3,
        patchstride=1,
    )

    def serial_embed(paths):
        # the reference's batch_size=1 dataloader: one _embed per image
        # (examples/main.py:212-218 + patchcore.py:330-353)
        feats = []
        for path in paths:
            img = load_image(path, _RESIZE, _IMAGESIZE)[None]
            with torch.no_grad():
                feats.append(core._embed(torch.from_numpy(img), mode))
        return torch.tensor(np.asarray(feats, dtype=np.float32))

    test_ds = ref.mvtec.MVTecDataset(
        source=root, split=ref.mvtec.DatasetSplit.TEST, classname="bottle",
        resize=_RESIZE, imagesize=_IMAGESIZE)
    test_paths = [row[2] for row in test_ds.data_to_iterate]
    Z = serial_embed(test_paths)

    if mode == "supervised":
        train_ds = ref.mvtec.MVTecDataset(
            source=root, split=ref.mvtec.DatasetSplit.TRAIN,
            classname="bottle", resize=_RESIZE, imagesize=_IMAGESIZE)
        # quirk #6 contract: the unseeded DataLoader shuffle is pinned to
        # the pipeline's seeded permutation on both sides (PARITY.md #6)
        order = np.random.default_rng(_SEED).permutation(len(train_ds))
        train_paths = [train_ds.data_to_iterate[i][2] for i in order]
        Z_train_full = serial_embed(train_paths)
        # quirk #2: truncation by train_ratio * len(TEST set)
        # (examples/main.py:281) — the reference's own arithmetic
        Z_train = Z_train_full[: int(_TRAIN_RATIO * len(Z)), :, :]
        matrix_alpha = ref.utils.Matrix_Alpha_Supervised(
            tau=_TAU, k=1, Z=Z, Z_train=Z_train, device=torch.device("cpu"))
    elif mode == "unsupervised":
        matrix_alpha = ref.utils.Matrix_Alpha_Unsupervised(
            tau=_TAU, k=1, Z=Z, device=torch.device("cpu"))
    else:
        matrix_alpha = torch.ones(Z.shape[0], Z.shape[1]) / Z.shape[1]

    matrix_alpha = matrix_alpha.unsqueeze(1).float()
    X = np.array(torch.bmm(matrix_alpha, Z).squeeze(1))
    return matrix_alpha.squeeze(1).numpy(), X, test_paths


def _our_category_data(ref, root: str, mode: str, tmp_path):
    import dataclasses

    from tpu_ac.models.convert import torch_state_dict_to_params
    from tpu_ac.models.vit import ViTConfig
    from tpu_ac.pipeline import CategoryEmbedder, PipelineConfig, run_category

    torch.manual_seed(0)
    ref_backbone = ref.vits.vit_tiny(patch_size=16)
    ref_backbone.eval()
    params = torch_state_dict_to_params(
        {k: v for k, v in ref_backbone.state_dict().items()})
    vit_cfg = ViTConfig(patch_size=16, embed_dim=192, depth=12, num_heads=3)
    cfg = PipelineConfig(
        backbone_name="composed_test", layers=_LAYERS,
        pretrain_embed_dimension=_PRETRAIN,
        target_embed_dimension=_TARGET, patchsize=3, tau=_TAU,
        train_ratio=_TRAIN_RATIO, supervised=mode,
        resize=_RESIZE, imagesize=_IMAGESIZE, batch_size=4)
    cfg = dataclasses.replace(cfg)
    embedder = CategoryEmbedder(params, vit_cfg, cfg)
    out = run_category(root, "bottle", cfg, embedder,
                       output_dir=str(tmp_path), seed=_SEED)
    return out


@pytest.mark.parametrize("mode", ["unsupervised", "supervised", "average"])
def test_composed_category_path_parity(ref, synth_root, tmp_path, mode):
    want_alpha, want_X, want_paths = _reference_category_data(
        ref, synth_root, mode)
    out = _our_category_data(ref, synth_root, mode, tmp_path)

    # iteration order: the reference's data_to_iterate vs our dataset walk
    got_paths = [it.image_path for it in out["items"]]
    assert got_paths == want_paths

    assert out["alpha"].shape == want_alpha.shape
    assert out["X"].shape == want_X.shape
    np.testing.assert_allclose(out["alpha"], want_alpha,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(out["X"], want_X, rtol=2e-3, atol=2e-3)


def test_supervised_truncation_arithmetic(ref, synth_root):
    """The quirk-#2 count: int(train_ratio * n_test), NOT n_train-based.

    With n_train=6, n_test=12, ratio=0.25 the bank must hold 3 images'
    patches — the reference's own slicing applied to the full shuffled
    train embedding (examples/main.py:281)."""
    n_test, n_train = 12, 6
    keep = int(_TRAIN_RATIO * n_test)
    assert keep == 3 and keep < n_train
    test_ds = ref.mvtec.MVTecDataset(
        source=synth_root, split=ref.mvtec.DatasetSplit.TEST,
        classname="bottle", resize=_RESIZE, imagesize=_IMAGESIZE)
    train_ds = ref.mvtec.MVTecDataset(
        source=synth_root, split=ref.mvtec.DatasetSplit.TRAIN,
        classname="bottle", resize=_RESIZE, imagesize=_IMAGESIZE)
    assert (len(test_ds), len(train_ds)) == (n_test, n_train)
