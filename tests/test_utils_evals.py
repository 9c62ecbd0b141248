"""Checkpoint/logging utilities + DINO eval suites."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path):
        from tpu_ac.utils import save_checkpoint, restore_checkpoint

        state = {"a": jnp.arange(4.0), "nested": {"b": jnp.ones((2, 3))}}
        path = save_checkpoint(str(tmp_path), "test", state, step=7,
                               extra={"epoch": 3})
        restored, meta = restore_checkpoint(path, state)
        assert meta["step"] == 7 and meta["extra"]["epoch"] == 3
        np.testing.assert_array_equal(np.asarray(restored["a"]),
                                      np.arange(4.0))
        np.testing.assert_array_equal(np.asarray(restored["nested"]["b"]),
                                      np.ones((2, 3)))

    def test_latest_and_keep(self, tmp_path):
        from tpu_ac.utils import save_checkpoint, latest_checkpoint

        state = {"x": jnp.zeros(2)}
        for s in (1, 5, 3):
            save_checkpoint(str(tmp_path), "run", state, step=s, keep=2)
        latest = latest_checkpoint(str(tmp_path), "run")
        assert latest.endswith("run-00000005")
        assert len(os.listdir(tmp_path)) == 2  # keep=2 pruned step 1

    def test_structure_mismatch_raises(self, tmp_path):
        from tpu_ac.utils import save_checkpoint, restore_checkpoint

        path = save_checkpoint(str(tmp_path), "t", {"a": jnp.zeros(2)})
        with pytest.raises(ValueError):
            restore_checkpoint(path, {"a": jnp.zeros(2), "b": jnp.zeros(2)})

    def test_bfloat16_leaves_roundtrip(self, tmp_path):
        """npz alone writes ml_dtypes leaves as raw '|V2' bytes; the
        dtype record in meta.json must restore them bit-exactly."""
        import ml_dtypes

        from tpu_ac.utils import save_checkpoint, restore_checkpoint

        rng = np.random.default_rng(0)
        state = {"w": jnp.asarray(rng.standard_normal((3, 4)),
                                  jnp.bfloat16),
                 "b": jnp.arange(4.0)}
        path = save_checkpoint(str(tmp_path), "bf16", state)
        restored, _ = restore_checkpoint(path, state)
        assert np.asarray(restored["w"]).dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            np.asarray(restored["w"]).view(np.uint16),
            np.asarray(state["w"]).view(np.uint16))
        assert np.asarray(restored["b"]).dtype == np.float64 or \
            np.asarray(restored["b"]).dtype == np.float32

    def test_same_step_overwrite_and_prev_fallback(self, tmp_path):
        """Overwriting step S parks the old checkpoint at '.prev' during
        the swap; if a crash leaves only the .prev, latest_checkpoint
        falls back to it."""
        import shutil

        from tpu_ac.utils import (latest_checkpoint, restore_checkpoint,
                                  save_checkpoint)

        state1 = {"x": jnp.zeros(2)}
        state2 = {"x": jnp.ones(2)}
        path = save_checkpoint(str(tmp_path), "ow", state1, step=4)
        assert save_checkpoint(str(tmp_path), "ow", state2, step=4) == path
        restored, _ = restore_checkpoint(path, state1)
        np.testing.assert_array_equal(np.asarray(restored["x"]), np.ones(2))
        assert not os.path.exists(path + ".prev")  # cleaned after swap
        # simulate the interrupted-overwrite window: only .prev remains
        shutil.move(path, path + ".prev")
        assert latest_checkpoint(str(tmp_path), "ow") == path + ".prev"
        restored, _ = restore_checkpoint(path + ".prev", state1)
        np.testing.assert_array_equal(np.asarray(restored["x"]), np.ones(2))

    def test_shape_mismatch_raises(self, tmp_path):
        from tpu_ac.utils import save_checkpoint, restore_checkpoint

        path = save_checkpoint(str(tmp_path), "s", {"a": jnp.zeros((2, 3))})
        with pytest.raises(ValueError, match="shape"):
            restore_checkpoint(path, {"a": jnp.zeros((3, 2))})

    def test_dino_state_roundtrip(self, tmp_path):
        from tpu_ac.models.vit import ViTConfig
        from tpu_ac.train import DINOConfig, init_dino_state
        from tpu_ac.utils import save_checkpoint, restore_checkpoint

        vit = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2,
                        img_size=32)
        cfg = DINOConfig(out_dim=32, local_crops_number=0, head_hidden_dim=16,
                         head_bottleneck_dim=8, epochs=1, steps_per_epoch=1)
        state = init_dino_state(0, vit, cfg)
        path = save_checkpoint(str(tmp_path), "dino", state, step=0)
        restored, _ = restore_checkpoint(path, state)
        np.testing.assert_array_equal(
            np.asarray(restored.student["backbone.cls_token"]),
            np.asarray(state.student["backbone.cls_token"]))


class TestLogging:
    def test_smoothed_value(self):
        from tpu_ac.utils import SmoothedValue

        v = SmoothedValue(window_size=3)
        for x in (1.0, 2.0, 3.0, 4.0):
            v.update(x)
        assert v.value == 4.0
        assert v.avg == pytest.approx(3.0)       # window (2,3,4)
        assert v.global_avg == pytest.approx(2.5)
        assert v.max == 4.0

    def test_metric_logger_log_every(self):
        from tpu_ac.utils import MetricLogger

        lines = []
        ml = MetricLogger(printer=lines.append)
        for x in ml.log_every(range(5), 2, header="ep0"):
            ml.update(loss=float(x))
        assert ml.meters["loss"].global_avg == pytest.approx(2.0)
        assert any("ep0" in ln for ln in lines)
        assert any("Total time" in ln for ln in lines)

    def test_metric_logger_pickle_deepcopy(self):
        """__getattr__ must not touch self.meters before __dict__ exists
        (unpickling/deepcopy re-entered it forever)."""
        import copy
        import pickle

        from tpu_ac.utils import MetricLogger

        ml = MetricLogger()
        ml.update(loss=1.5)
        clone = pickle.loads(pickle.dumps(ml))
        assert clone.meters["loss"].value == 1.5
        assert copy.deepcopy(ml).meters["loss"].value == 1.5
        with pytest.raises(AttributeError):
            ml.nonexistent_meter


class TestKnnClassifier:
    def test_separable_classes(self, rng):
        from tpu_ac.train.evals import knn_classifier

        a = rng.standard_normal((50, 16)) + 4
        b = rng.standard_normal((50, 16)) - 4
        train = np.concatenate([a, b]).astype(np.float32)
        train /= np.linalg.norm(train, axis=1, keepdims=True)
        labels = np.array([0] * 50 + [1] * 50)
        test = train[::5]
        tlabels = labels[::5]
        top1, top5 = knn_classifier(train, labels, test, tlabels, k=10,
                                    T=0.07, num_classes=2)
        assert top1 == 100.0

    def test_extract_features_batched(self, rng):
        from tpu_ac.train.evals import extract_features

        imgs = rng.standard_normal((10, 4)).astype(np.float32)
        feats = extract_features(lambda x: x * 2, imgs, batch_size=4,
                                 normalize=False)
        np.testing.assert_allclose(feats, imgs * 2)

    def test_extract_features_mesh_matches_single(self, rng):
        """mesh path (the reference's DDP extract + all_gather into the
        rank-0 matrix, eval_knn.py:118-139) == single-device features.

        Weights travel as the params= jit argument (the mesh path REQUIRES
        it — a closed-over param tree would inline the model into the HLO,
        which remote compile services reject)."""
        import jax.numpy as jnp

        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.evals import extract_features

        imgs = rng.standard_normal((19, 6)).astype(np.float32)
        w = rng.standard_normal((6, 3)).astype(np.float32)
        fn = lambda p, x: jnp.tanh(x @ p["w"])
        single = extract_features(fn, imgs, batch_size=8, params={"w": w})
        sharded = extract_features(fn, imgs, batch_size=8,
                                   mesh=get_mesh(8), params={"w": w})
        np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-6)

    def test_extract_features_mesh_rejects_indivisible_batch(self, rng):
        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.evals import extract_features

        with pytest.raises(ValueError, match="divisible"):
            extract_features(lambda p, x: x, np.zeros((8, 2), np.float32),
                             batch_size=6, mesh=get_mesh(4),
                             params={"w": np.zeros(2, np.float32)})

    def test_linear_probe_dp_matches_single(self, rng):
        """make_linear_probe(mesh=...) — the reference's DDP-wrapped
        LinearClassifier (eval_linear.py:62) — must step identically to
        the single-device probe (global-batch mean == DDP grad average
        at equal shard sizes)."""
        import jax.numpy as jnp

        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.evals import make_linear_probe

        feats = rng.standard_normal((16, 12)).astype(np.float32)
        labels = rng.integers(0, 3, 16)
        s0, step0, pred0 = make_linear_probe(12, 3, seed=3)
        s1, step1, pred1 = make_linear_probe(12, 3, seed=3,
                                             mesh=get_mesh(8))
        for it in range(3):
            s0, l0 = step0(s0, jnp.asarray(feats), jnp.asarray(labels),
                           jnp.float32(0.1))
            s1, l1 = step1(s1, jnp.asarray(feats), jnp.asarray(labels),
                           jnp.float32(0.1))
            np.testing.assert_allclose(float(l1), float(l0),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.weight),
                                   np.asarray(s0.weight),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred1(s1, jnp.asarray(feats))),
                                   np.asarray(pred0(s0, jnp.asarray(feats))),
                                   rtol=1e-5, atol=1e-5)

    def test_extract_features_mesh_requires_params(self, rng):
        """Closure-style embed_fn on the mesh path is the documented
        weight-capture trap (CLAUDE.md) — must be rejected loudly."""
        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.evals import extract_features

        with pytest.raises(ValueError, match="params"):
            extract_features(lambda x: x, np.zeros((8, 2), np.float32),
                             batch_size=8, mesh=get_mesh(4))


class TestLinearProbe:
    def test_learns_linear_problem(self, rng):
        import jax.numpy as jnp
        from tpu_ac.train.evals import make_linear_probe

        w_true = rng.standard_normal((3, 8)).astype(np.float32)
        x = rng.standard_normal((256, 8)).astype(np.float32)
        y = (x @ w_true.T).argmax(1)
        state, step, predict = make_linear_probe(8, 3, seed=0)
        for i in range(200):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(y),
                               jnp.float32(0.5))
        preds = np.asarray(predict(state, jnp.asarray(x))).argmax(1)
        assert np.mean(preds == y) > 0.95


class TestPCAMap:
    def test_pca_whitening(self, rng):
        from tpu_ac.train.evals import PCA

        x = rng.standard_normal((200, 16)).astype(np.float32) * \
            np.linspace(1, 10, 16)
        pca = PCA(dim=4, whit=0.5)
        pca.fit(x)
        out = pca.apply(x)
        assert out.shape == (200, 4)
        # whitening at whit=0.5: unit variance along kept components
        np.testing.assert_allclose(out.std(axis=0), 1.0, rtol=0.2)

    def test_compute_ap_perfect(self):
        from tpu_ac.train.evals import compute_ap

        assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)

    def test_compute_map(self):
        from tpu_ac.train.evals import compute_map

        # db of 4, one query; positives ranked 0 and 2
        ranks = np.array([[0], [3], [1], [2]])  # ranks[:, q] = db idx order
        gnd = [{"ok": [0, 1]}]
        m, aps, _, _ = compute_map(ranks, gnd)
        # positives (db 0, 1) at ranks 0 and 2; trapezoid AP:
        # j=0: (1 + 1)/2 * 1/2 = 0.5; j=1: (1/2 + 2/3)/2 * 1/2 = 0.29167
        assert m == pytest.approx(0.5 + (0.5 + 2.0 / 3.0) / 4.0)


class TestLARS:
    def test_matches_torch_reference_step(self, rng):
        """One LARS step vs the reference update math (utils.py:575-591)."""
        import jax.numpy as jnp
        import torch
        from tpu_ac.train.optim import lars

        w = rng.standard_normal((4, 3)).astype(np.float32)
        g = rng.standard_normal((4, 3)).astype(np.float32)
        b = rng.standard_normal((3,)).astype(np.float32)
        gb = rng.standard_normal((3,)).astype(np.float32)
        params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        grads = {"w": jnp.asarray(g), "b": jnp.asarray(gb)}
        opt = lars(learning_rate=0.1, momentum=0.9, weight_decay=1e-4,
                   eta=0.001)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)

        # torch-style reference for the 2D param
        dp = torch.from_numpy(g) + 1e-4 * torch.from_numpy(w)
        q = 0.001 * torch.norm(torch.from_numpy(w)) / torch.norm(dp)
        dp = dp * q
        mu = dp  # zero-init momentum buffer
        want = -0.1 * mu
        np.testing.assert_allclose(np.asarray(updates["w"]), want.numpy(),
                                   rtol=1e-5, atol=1e-7)
        # 1-D param: no wd, no adaptation
        np.testing.assert_allclose(np.asarray(updates["b"]), -0.1 * gb,
                                   rtol=1e-6)

    def test_hub_factories(self):
        from tpu_ac import hub

        params, cfg, family = hub.dino_vits16()
        assert family == "vit" and cfg.patch_size == 16
        params, cfg, family = hub.wide_resnet50_2()
        assert family == "resnet"


class TestRetrieval:
    def test_retrieval_eval_perfect(self, rng):
        from tpu_ac.train.evals import image_retrieval_eval

        db = rng.standard_normal((20, 8)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        # queries identical to db items 3 and 7
        q = db[[3, 7]]
        gnd = [{"ok": [3]}, {"ok": [7]}]
        out = image_retrieval_eval(q, db, gnd)
        assert out["mAP"] == pytest.approx(1.0)


class TestDenseNetRemap:
    def test_legacy_keys(self):
        from tpu_ac.models.convert import remap_densenet_keys

        sd = {"features.denseblock1.denselayer1.norm.1.weight": 1,
              "features.denseblock1.denselayer1.conv.2.weight": 2,
              "features.conv0.weight": 3}
        out = remap_densenet_keys(sd)
        assert "features.denseblock1.denselayer1.norm1.weight" in out
        assert "features.denseblock1.denselayer1.conv2.weight" in out
        assert "features.conv0.weight" in out


class TestComputeMapTruncation:
    def test_all_positives_within_kappa_score_one(self):
        """Reference kq truncation (utils.py:804-806): a query whose every
        positive ranks inside kappa gets precision 1.0, not n_pos/kappa."""
        from tpu_ac.train.evals import compute_map

        ranks = np.arange(30)[:, None]  # identity ranking, 1 query
        gnd = [{"ok": np.asarray([0])}]  # single positive at rank 0
        _map, _aps, pr, prs = compute_map(ranks, gnd, kappas=[1, 5, 10])
        np.testing.assert_allclose(prs[0], [1.0, 1.0, 1.0])

    def test_positives_beyond_kappa(self):
        from tpu_ac.train.evals import compute_map

        ranks = np.arange(30)[:, None]
        gnd = [{"ok": np.asarray([0, 1, 20])}]  # ranks 1,2,21 (1-based)
        _map, _aps, _pr, prs = compute_map(ranks, gnd, kappas=[5])
        # kq = min(21, 5) = 5; positives <= 5: two -> 2/5
        np.testing.assert_allclose(prs[0], [2 / 5])


class TestProfilingAndSeeding:
    def test_maybe_profile_writes_trace(self, tmp_path):
        import jax.numpy as jnp
        from tpu_ac.utils.profiling import maybe_profile, step_annotation

        d = str(tmp_path / "trace")
        with maybe_profile(d):
            with step_annotation("unit", step=0):
                jnp.ones((4, 4)).sum().block_until_ready()
        found = [f for root, _, fs in os.walk(d) for f in fs]
        assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
                   for f in found), found

    def test_maybe_profile_none_is_noop(self, tmp_path):
        from tpu_ac.utils.profiling import maybe_profile

        with maybe_profile(None):
            pass
        assert not os.listdir(tmp_path)

    def test_fix_seeds_reproducible(self):
        import random
        from tpu_ac.utils.seeding import fix_seeds

        key1 = fix_seeds(7)
        a = (random.random(), np.random.rand(3).tolist())
        key2 = fix_seeds(7)
        b = (random.random(), np.random.rand(3).tolist())
        assert a == b
        assert np.array_equal(np.asarray(key1), np.asarray(key2))
        assert fix_seeds(7, with_jax_key=False) is None
