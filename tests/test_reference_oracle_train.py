"""Training-stack parity against the ACTUAL reference implementations.

Extends tests/test_reference_oracle.py (which covers the Anomaly-Clustering
core) to the training workloads, importing the reference's own modules as
oracles:

- ``Unsupervised-Classification-master/losses/losses.py`` — SimCLR / SCAN /
  ConfidenceBasedCE / entropy vs tpu_ac.train.scan
- ``dino-main/main_dino.py`` DINOLoss — vs tpu_ac.train.dino.dino_loss
- ``dino-main/utils.py`` cosine_scheduler / PCA / compute_ap / compute_map —
  vs tpu_ac.train.{dino,evals}

The reference files import only torch/numpy (main_dino also needs a
torchvision stub and a no-op torch.distributed shim for the loss's
center all_reduce, which is a single-process identity).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SCAN_LOSSES = ("/root/reference/Unsupervised-Classification-master/"
                "losses/losses.py")
_DINO_DIR = "/root/reference/dino-main"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_SCAN_LOSSES) or not os.path.isdir(_DINO_DIR),
    reason="reference tree not mounted")


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_losses():
    # the reference hardcodes .cuda() on loss-internal tensors
    # (losses.py:55,142,155); identity-shim it for the CPU oracle run
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield _load("ref_scan_losses", _SCAN_LOSSES)
    finally:
        torch.Tensor.cuda = orig


@pytest.fixture(scope="module")
def ref_dino_utils():
    return _load("utils", os.path.join(_DINO_DIR, "utils.py"))


@pytest.fixture(scope="module")
def ref_main_dino(ref_dino_utils):
    # main_dino imports torchvision (stubbed — unused by DINOLoss), utils
    # (the dino one, loaded above under its expected top-level name) and
    # vision_transformer.  test_reference_oracle.py may have registered a
    # barer torchvision stub already — augment it rather than skip, or the
    # `from torchvision import datasets, transforms` line fails.
    stub = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    if not hasattr(stub, "datasets"):
        stub.datasets = types.SimpleNamespace()
    if not hasattr(stub, "transforms"):
        stub.transforms = types.SimpleNamespace(
            Compose=object, RandomResizedCrop=object)
    if not hasattr(stub, "models"):
        stub.models = types.SimpleNamespace(__dict__={})
    sys.modules["torchvision"] = stub
    _load("vision_transformer", os.path.join(_DINO_DIR,
                                             "vision_transformer.py"))
    mod = _load("ref_main_dino", os.path.join(_DINO_DIR, "main_dino.py"))
    # single-process shim: all_reduce is the identity, world size 1
    mod.dist = types.SimpleNamespace(all_reduce=lambda t: None,
                                     get_world_size=lambda: 1)
    return mod


class TestSCANLossOracles:
    def test_simclr_loss(self, rng, ref_losses):
        from tpu_ac.train.scan import simclr_loss

        b, dim = 12, 32
        f = rng.standard_normal((b, 2, dim)).astype(np.float32)
        f /= np.linalg.norm(f, axis=2, keepdims=True)
        want = ref_losses.SimCLRLoss(temperature=0.1)(
            torch.from_numpy(f)).item()
        got = float(simclr_loss(f, temperature=0.1))
        assert got == pytest.approx(want, rel=1e-5)

    def test_scan_loss(self, rng, ref_losses):
        from tpu_ac.train.scan import scan_loss

        anchors = rng.standard_normal((16, 10)).astype(np.float32)
        neighbors = rng.standard_normal((16, 10)).astype(np.float32)
        total_t, cons_t, ent_t = ref_losses.SCANLoss(entropy_weight=2.0)(
            torch.from_numpy(anchors), torch.from_numpy(neighbors))
        total, cons, ent = scan_loss(anchors, neighbors, entropy_weight=2.0)
        assert float(total) == pytest.approx(total_t.item(), rel=1e-5)
        assert float(cons) == pytest.approx(cons_t.item(), rel=1e-5)
        assert float(ent) == pytest.approx(ent_t.item(), rel=1e-5)

    def test_entropy(self, rng, ref_losses):
        from tpu_ac.train.scan import entropy

        probs = rng.random((8, 10)).astype(np.float32)
        probs /= probs.sum(axis=1, keepdims=True)
        want = ref_losses.entropy(torch.from_numpy(probs),
                                  input_as_probabilities=True).item()
        assert float(entropy(probs)) == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("balancing", [True, False])
    def test_confidence_based_ce(self, rng, ref_losses, balancing):
        from tpu_ac.train.scan import confidence_based_ce

        weak = rng.standard_normal((32, 5)).astype(np.float32) * 8.0
        strong = rng.standard_normal((32, 5)).astype(np.float32)
        crit = ref_losses.ConfidenceBasedCE(threshold=0.9,
                                            apply_class_balancing=balancing)
        want = crit(torch.from_numpy(weak), torch.from_numpy(strong)).item()
        got = float(confidence_based_ce(weak, strong, threshold=0.9,
                                        apply_class_balancing=balancing))
        assert got == pytest.approx(want, rel=1e-4)


class TestDINOLossOracle:
    def test_dino_loss_matches_reference(self, rng, ref_main_dino):
        from tpu_ac.train.dino import dino_loss

        out_dim, b, ncrops = 16, 6, 4
        crit = ref_main_dino.DINOLoss(
            out_dim, ncrops=ncrops, warmup_teacher_temp=0.04,
            teacher_temp=0.07, warmup_teacher_temp_epochs=5, nepochs=10)
        center = rng.standard_normal((1, out_dim)).astype(np.float32)
        crit.center = torch.from_numpy(center.copy())
        student = rng.standard_normal((ncrops * b, out_dim)).astype(np.float32)
        teacher = rng.standard_normal((2 * b, out_dim)).astype(np.float32)
        epoch = 2
        want = crit(torch.from_numpy(student), torch.from_numpy(teacher),
                    epoch).item()
        temp = crit.teacher_temp_schedule[epoch]
        got = float(dino_loss(student, teacher, center[0], ncrops=ncrops,
                              teacher_temp=float(temp)))
        assert got == pytest.approx(want, rel=1e-5)


class TestDINOUtilsOracles:
    def test_cosine_scheduler(self, ref_dino_utils):
        from tpu_ac.train.dino import cosine_scheduler

        epochs, niter = 7, 13
        want = ref_dino_utils.cosine_scheduler(
            0.5, 1e-4, epochs, niter, warmup_epochs=2,
            start_warmup_value=1e-6)
        got = cosine_scheduler(0.5, 1e-4, total_steps=epochs * niter,
                               warmup_steps=2 * niter,
                               start_warmup_value=1e-6)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_pca_whitening(self, rng, ref_dino_utils, capsys):
        from tpu_ac.train.evals import PCA

        x = rng.standard_normal((64, 24)).astype(np.float64)
        cov = np.cov(x.T)
        ref = ref_dino_utils.PCA(dim=8, whit=0.5)
        ref.train_pca(cov.copy())
        ours = PCA(dim=8, whit=0.5)
        ours.train_pca(cov.copy())
        q = rng.standard_normal((5, 24))
        np.testing.assert_allclose(ours.apply(q.copy()),
                                   np.asarray(ref.apply(q.copy())),
                                   rtol=1e-8, atol=1e-10)

    def test_compute_ap_and_map(self, rng, ref_dino_utils):
        from tpu_ac.train.evals import compute_ap, compute_map

        ranks = np.asarray([0, 2, 5, 9])
        assert compute_ap(ranks, 4) == pytest.approx(
            ref_dino_utils.compute_ap(ranks, 4), rel=1e-9)

        # revisited-style gnd over 30 ranked images, 4 queries
        nq, ndb = 4, 30
        gnd = []
        for _ in range(nq):
            perm = rng.permutation(ndb)
            gnd.append({"ok": perm[:5], "junk": perm[5:9]})
        ranks_mat = np.stack([rng.permutation(ndb) for _ in range(nq)]).T
        want = ref_dino_utils.compute_map(ranks_mat, gnd, kappas=[1, 5, 10])
        got = compute_map(ranks_mat, gnd, kappas=[1, 5, 10])
        np.testing.assert_allclose(got[0], want[0], rtol=1e-9)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-9)
        np.testing.assert_allclose(got[2], want[2], rtol=1e-9)
        np.testing.assert_allclose(got[3], want[3], rtol=1e-9)


class TestDINOHeadStateDict:
    def test_params_load_into_reference_head(self, rng, ref_main_dino):
        """Our DINO-head param keys must load key-for-key into the
        reference's torch DINOHead (nn.Sequential Linears at mlp.0/2/4)
        and reproduce its forward."""
        import vision_transformer as ref_vits  # loaded by ref_main_dino

        from tpu_ac.models import dino_head_forward, init_dino_head_params

        p = init_dino_head_params(0, in_dim=32, out_dim=48, hidden_dim=24,
                                  bottleneck_dim=16)
        head = ref_vits.DINOHead(32, 48, hidden_dim=24, bottleneck_dim=16,
                                 norm_last_layer=False)
        state = {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
        head.load_state_dict(state, strict=True)
        x = rng.standard_normal((4, 32)).astype(np.float32)
        with torch.no_grad():
            want = head(torch.from_numpy(x)).numpy()
        got = np.asarray(dino_head_forward(p, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_evaluate_utils():
    """Load the reference's evaluate_utils.py with its project imports
    stubbed (only the hungarian path is exercised — common_config /
    NeighborsDataset / entropy are untouched by it)."""
    path = ("/root/reference/Unsupervised-Classification-master/"
            "utils/evaluate_utils.py")
    saved = {k: sys.modules.get(k)
             for k in ("utils", "utils.common_config", "utils.utils",
                       "data", "data.custom_dataset", "losses",
                       "losses.losses")}
    try:
        utils_pkg = types.ModuleType("utils")
        utils_pkg.__path__ = []
        common_config = types.ModuleType("utils.common_config")
        common_config.get_feature_dimensions_backbone = lambda p: 512
        utils_utils = types.ModuleType("utils.utils")
        utils_utils.AverageMeter = object
        utils_utils.confusion_matrix = lambda *a, **k: None
        utils_pkg.common_config = common_config
        utils_pkg.utils = utils_utils
        data_pkg = types.ModuleType("data")
        data_pkg.__path__ = []
        custom_dataset = types.ModuleType("data.custom_dataset")
        custom_dataset.NeighborsDataset = object
        losses_pkg = types.ModuleType("losses")
        losses_pkg.__path__ = []
        losses_mod = types.ModuleType("losses.losses")
        losses_mod.entropy = lambda *a, **k: torch.tensor(0.0)
        sys.modules.update({
            "utils": utils_pkg, "utils.common_config": common_config,
            "utils.utils": utils_utils, "data": data_pkg,
            "data.custom_dataset": custom_dataset, "losses": losses_pkg,
            "losses.losses": losses_mod,
        })
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            yield _load("ref_evaluate_utils", path)
        finally:
            torch.Tensor.cuda = orig_cuda
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class TestHungarianEvaluateOracle:
    @pytest.mark.parametrize("n_classes", [5, 10])
    def test_matches_reference(self, rng, ref_evaluate_utils, n_classes):
        """hungarian_evaluate ACC / NMI / ARI / Top-5 + match vs the
        reference's own hungarian_evaluate (evaluate_utils.py:122-159)."""
        from tpu_ac.cluster.metrics import hungarian_evaluate

        n = 200
        targets = rng.integers(0, n_classes, n)
        # correlated (not pure-noise) probabilities so the match is
        # non-trivial: shift mass toward a permuted version of the target
        logits = rng.standard_normal((n, n_classes)).astype(np.float32)
        perm = rng.permutation(n_classes)
        logits[np.arange(n), perm[targets]] += 1.5
        probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)

        head = {
            "targets": torch.from_numpy(targets),
            "predictions": torch.from_numpy(probs.argmax(1)),
            "probabilities": torch.from_numpy(probs),
        }
        want = ref_evaluate_utils.hungarian_evaluate(
            0, [head], compute_confusion_matrix=False)
        got = hungarian_evaluate(probs, targets)
        assert got["ACC"] == pytest.approx(want["ACC"], abs=1e-12)
        assert got["NMI"] == pytest.approx(want["NMI"], rel=1e-9)
        assert got["ARI"] == pytest.approx(want["ARI"], rel=1e-9)
        assert got["ACC Top-5"] == pytest.approx(want["ACC Top-5"],
                                                 abs=1e-12)
        assert sorted(map(tuple, got["hungarian_match"])) == \
            sorted(map(tuple, want["hungarian_match"]))


@pytest.fixture(scope="module")
def ref_video_seg():
    """The reference's eval_video_segmentation.py, imported with a
    torchvision stub and a CPU-identity Tensor.cuda shim (the module
    hardcodes .cuda() on the neighborhood mask and segs)."""
    pytest.importorskip("cv2")
    stub = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    if not hasattr(stub, "transforms"):
        stub.transforms = types.SimpleNamespace(Compose=object)
    sys.modules["torchvision"] = stub
    _load("utils", os.path.join(_DINO_DIR, "utils.py"))
    _load("vision_transformer",
          os.path.join(_DINO_DIR, "vision_transformer.py"))
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield _load("ref_eval_video_seg",
                    os.path.join(_DINO_DIR, "eval_video_segmentation.py"))
    finally:
        torch.Tensor.cuda = orig


class TestVideoSegPropagationOracle:
    """propagate_labels vs the reference's own label_propagation
    (eval_video_segmentation.py:113-150): exp(sim/0.1) affinities,
    optional spatial neighborhood mask, per-query top-k thresholding over
    all context sources, column-normalized label averaging."""

    @pytest.mark.parametrize("neigh", [0, 1])
    def test_label_propagation_parity(self, rng, ref_video_seg, neigh):
        from tpu_ac.train.video_seg import propagate_labels

        h = w = 4
        d, n_ctx, n_cls, topk, patch = 16, 3, 3, 2, 8
        mod = ref_video_seg
        mod.args = types.SimpleNamespace(size_mask_neighborhood=neigh,
                                         topk=topk)
        feat_tar = rng.standard_normal((h * w, d)).astype(np.float32)
        ctx = rng.standard_normal((n_ctx, h * w, d)).astype(np.float32)
        segs = rng.random((n_ctx, n_cls, h, w)).astype(np.float32)

        class _FakeViT:
            # extract_feature only touches these two members
            patch_embed = types.SimpleNamespace(patch_size=patch)

            def get_intermediate_layers(self, x, n=1):
                tok = torch.cat([torch.zeros(1, d),
                                 torch.from_numpy(feat_tar)])
                return [tok[None]]

        frame = torch.zeros(3, h * patch, w * patch)
        list_feats = [torch.from_numpy(c).T.contiguous() for c in ctx]
        list_segs = [torch.from_numpy(s)[None] for s in segs]
        seg_tar, ret_feat, _ = mod.label_propagation(
            mod.args, _FakeViT(), frame, list_feats, list_segs)
        want = seg_tar[0].numpy()
        np.testing.assert_allclose(ret_feat.numpy(), feat_tar.T)

        got = np.asarray(propagate_labels(
            feat_tar, ctx, segs, grid=(h, w), topk=topk,
            size_mask_neighborhood=neigh))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_norm_mask_parity(self, rng, ref_video_seg):
        from tpu_ac.train.video_seg import norm_mask

        m = rng.random((3, 5, 5)).astype(np.float32)
        m[1] = 0.0  # all-zero channel exercises the max()>0 guard
        want = ref_video_seg.norm_mask(torch.from_numpy(m.copy())).numpy()
        np.testing.assert_allclose(norm_mask(m), want, rtol=1e-6)

    def test_to_one_hot_parity(self, rng, ref_video_seg):
        from tpu_ac.train.video_seg import to_one_hot

        labels = rng.integers(0, 4, (6, 5))
        want = ref_video_seg.to_one_hot(
            torch.from_numpy(labels)[None].float())[0].numpy()
        np.testing.assert_array_equal(to_one_hot(labels, 4), want)

    def test_restrict_neighborhood_parity(self, ref_video_seg):
        from tpu_ac.train.video_seg import restrict_neighborhood

        mod = ref_video_seg
        mod.args = types.SimpleNamespace(size_mask_neighborhood=2, topk=5)
        want = mod.restrict_neighborhood(5, 6).numpy()
        np.testing.assert_array_equal(restrict_neighborhood(5, 6, size=2),
                                      want)
