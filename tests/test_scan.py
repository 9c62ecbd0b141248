"""SCAN pipeline: loss parity vs torch, model/bank/step invariants."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp
import optax

from tpu_ac.models.resnet_cifar import (
    CifarResNetConfig,
    cifar_resnet_forward,
    init_cifar_resnet,
)
from tpu_ac.train.scan import (
    MemoryBank,
    SCANModelConfig,
    clustering_forward,
    confidence_based_ce,
    contrastive_forward,
    entropy,
    init_clustering_model,
    init_contrastive_model,
    init_train_state,
    make_scan_step,
    make_selflabel_step,
    make_simclr_step,
    scan_loss,
    simclr_loss,
)

TINY_BACKBONE = CifarResNetConfig(block_counts=(1, 1, 1, 1),
                                  widths=(8, 16, 32, 64))
TINY = SCANModelConfig(backbone=TINY_BACKBONE, feature_dim=16,
                       n_clusters=4, n_heads=2)


class TestLossesParity:
    def test_simclr_matches_torch(self, rng):
        f = rng.standard_normal((6, 2, 8)).astype(np.float32)
        f = f / np.linalg.norm(f, axis=-1, keepdims=True)
        got = float(simclr_loss(jnp.asarray(f), temperature=0.5))
        # torch reference math (losses/losses.py:124-165)
        ft = torch.from_numpy(f)
        b = 6
        mask = torch.eye(b)
        contrast = torch.cat(torch.unbind(ft, dim=1), dim=0)
        anchor = ft[:, 0]
        dp = anchor @ contrast.T / 0.5
        logits = dp - dp.max(dim=1, keepdim=True).values.detach()
        mask = mask.repeat(1, 2)
        logits_mask = torch.scatter(torch.ones_like(mask), 1,
                                    torch.arange(b).view(-1, 1), 0)
        mask = mask * logits_mask
        exp_logits = torch.exp(logits) * logits_mask
        log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True))
        want = float(-((mask * log_prob).sum(1) / mask.sum(1)).mean())
        assert got == pytest.approx(want, rel=1e-5)

    def test_scan_loss_matches_torch(self, rng):
        a = rng.standard_normal((8, 4)).astype(np.float32)
        n = rng.standard_normal((8, 4)).astype(np.float32)
        total, cons, ent = scan_loss(jnp.asarray(a), jnp.asarray(n), 2.0)
        at, nt = torch.from_numpy(a), torch.from_numpy(n)
        ap, np_ = at.softmax(1), nt.softmax(1)
        sim = torch.bmm(ap.view(8, 1, 4), np_.view(8, 4, 1)).squeeze()
        cons_t = F.binary_cross_entropy(sim, torch.ones_like(sim))
        x = torch.clamp(ap.mean(0), min=1e-8)
        ent_t = -(x * x.log()).sum()
        assert float(cons) == pytest.approx(float(cons_t), rel=1e-4)
        assert float(ent) == pytest.approx(float(ent_t), rel=1e-4)
        assert float(total) == pytest.approx(float(cons_t - 2.0 * ent_t),
                                             rel=1e-3)

    def test_confidence_ce_matches_torch(self, rng):
        weak = rng.standard_normal((16, 4)).astype(np.float32) * 4
        strong = rng.standard_normal((16, 4)).astype(np.float32)
        thr = 0.7
        got = float(confidence_based_ce(jnp.asarray(weak),
                                        jnp.asarray(strong), thr, True))
        wt, st = torch.from_numpy(weak), torch.from_numpy(strong)
        probs = wt.softmax(1)
        max_prob, target = probs.max(1)
        mask = max_prob > thr
        assert mask.any(), "test setup: need confident samples"
        target_m = torch.masked_select(target, mask)
        n = target_m.numel()
        idx, counts = torch.unique(target_m, return_counts=True)
        weight = torch.ones(4)
        weight[idx] = 1 / (counts.float() / n)
        input_m = st[mask]
        want = float(F.cross_entropy(input_m, target_m, weight=weight))
        assert got == pytest.approx(want, rel=1e-4)

    def test_entropy(self):
        p = jnp.asarray([[0.25, 0.25, 0.25, 0.25]])
        assert float(entropy(p)) == pytest.approx(np.log(4), rel=1e-5)


class TestCifarResNet:
    def test_forward_shapes_and_state(self, rng):
        params, state = init_cifar_resnet(0, TINY_BACKBONE)
        imgs = jnp.asarray(rng.standard_normal((4, 3, 32, 32)).astype(np.float32))
        feats, new_state = cifar_resnet_forward(params, state, imgs,
                                                TINY_BACKBONE, train=True)
        assert feats.shape == (4, 64)
        # training mode updates running stats
        assert not np.allclose(np.asarray(new_state["bn1.running_mean"]),
                               np.asarray(state["bn1.running_mean"]))

    def test_eval_mode_keeps_state(self, rng):
        params, state = init_cifar_resnet(0, TINY_BACKBONE)
        imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
        _, new_state = cifar_resnet_forward(params, state, imgs,
                                            TINY_BACKBONE, train=False)
        for k in state:
            np.testing.assert_array_equal(np.asarray(new_state[k]),
                                          np.asarray(state[k]))

    def test_bn_train_matches_torch(self, rng):
        """One BN layer in train mode vs torch.nn.functional.batch_norm."""
        params, state = init_cifar_resnet(0, TINY_BACKBONE)
        x = rng.standard_normal((4, 8, 16, 16)).astype(np.float32)
        from tpu_ac.models.resnet_cifar import _bn
        new_state = dict(state)
        got = _bn(params, state, new_state, "bn1", jnp.asarray(x), True,
                  TINY_BACKBONE)
        rm = torch.zeros(8)
        rv = torch.ones(8)
        want = F.batch_norm(torch.from_numpy(x), rm, rv,
                            torch.ones(8), torch.zeros(8),
                            training=True, momentum=0.1, eps=1e-5)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["bn1.running_mean"]), rm.numpy(),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_state["bn1.running_var"]), rv.numpy(),
            rtol=1e-4, atol=1e-5)


class TestMemoryBank:
    def test_mine_neighbors(self, rng):
        feats = rng.standard_normal((20, 8)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        bank = MemoryBank(20, 8, num_classes=2)
        bank.update(feats, rng.integers(0, 2, 20))
        idx, acc = bank.mine_nearest_neighbors(3)
        assert idx.shape == (20, 4)
        np.testing.assert_array_equal(idx[:, 0], np.arange(20))  # self first
        assert 0 <= acc <= 1

    def test_weighted_knn_vote(self, rng):
        a = rng.standard_normal((10, 8)) + 4
        b = rng.standard_normal((10, 8)) - 4
        feats = np.concatenate([a, b]).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        bank = MemoryBank(20, 8, num_classes=2)
        bank.update(feats, np.array([0] * 10 + [1] * 10))
        pred = bank.weighted_knn(feats, k=5)
        assert (pred[:10] == 0).all() and (pred[10:] == 1).all()


class TestTrainSteps:
    def test_simclr_step_decreases_loss(self, rng):
        import jax
        params, bn = init_contrastive_model(0, TINY)
        opt = optax.sgd(0.1, momentum=0.9)
        state = init_train_state(params, bn, opt)
        step = jax.jit(make_simclr_step(TINY, opt, temperature=0.5))
        xi = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
        xj = xi + 0.01 * jnp.asarray(
            rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
        losses = []
        for _ in range(4):
            state, loss = step(state, xi, xj)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_scan_step_runs_multihead(self, rng):
        import jax
        params, bn = init_clustering_model(0, TINY)
        opt = optax.adam(1e-3)
        state = init_train_state(params, bn, opt)
        step = jax.jit(make_scan_step(TINY, opt))
        a = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
        n = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
        state, metrics = step(state, a, n)
        assert metrics["head_losses"].shape == (2,)
        assert np.isfinite(float(metrics["total"]))

    def test_scan_head_only_freezes_backbone(self, rng):
        """Frozen means FROZEN under any optimizer — including decoupled
        weight decay (_sgd's add_decayed_weights injects wd*p into the
        updates even for zero gradients, so zeroing grads alone would let
        'frozen' backbone weights decay every step)."""
        import jax

        from tpu_ac.train.scan import _sgd
        for opt in (optax.sgd(0.1), _sgd(0.1)):
            params, bn = init_clustering_model(0, TINY)
            state = init_train_state(params, bn, opt)
            step = jax.jit(make_scan_step(TINY, opt,
                                          update_cluster_head_only=True))
            a = jnp.asarray(
                rng.standard_normal((4, 3, 32, 32)).astype(np.float32))
            s1, _ = step(state, a, a)
            np.testing.assert_array_equal(
                np.asarray(s1.params["conv1.weight"]),
                np.asarray(state.params["conv1.weight"]))
            assert not np.allclose(
                np.asarray(s1.params["cluster_head.0.weight"]),
                np.asarray(state.params["cluster_head.0.weight"]))

    def test_selflabel_step_with_ema(self, rng):
        import jax
        cfg = SCANModelConfig(backbone=TINY_BACKBONE, n_clusters=4, n_heads=1)
        params, bn = init_clustering_model(0, cfg)
        opt = optax.sgd(0.05)
        state = init_train_state(params, bn, opt)
        step = jax.jit(make_selflabel_step(cfg, opt, threshold=0.1,
                                           ema_momentum=0.9))
        w = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
        s = w + 0.1
        ema = dict(params)
        state, loss, ema = step(state, w, s, ema)
        assert np.isfinite(float(loss))
        # EMA stays between old and new params
        k = "cluster_head.0.weight"
        assert not np.allclose(np.asarray(ema[k]), np.asarray(params[k]))


class TestContrastiveEvaluate:
    def test_knn_monitor_separable(self):
        from tpu_ac.train.scan import (contrastive_evaluate,
                                       init_contrastive_model,
                                       contrastive_forward, MemoryBank)
        import jax.numpy as jnp

        cfg = TINY
        # hermetic rng: the shared session fixture's state depends on test
        # order, and the exp-weighted vote over the WHOLE tiny bank is
        # sensitive to the random-init embedding geometry
        local = np.random.default_rng(7)
        params, bn = init_contrastive_model(0, cfg)
        imgs = local.standard_normal((16, 3, 32, 32)).astype(np.float32) * 0.1
        imgs[:8, 0] += 3.0
        targets = np.array([0] * 8 + [1] * 8)
        emb, _, _ = contrastive_forward(params, bn, jnp.asarray(imgs), cfg)
        bank = MemoryBank(16, cfg.feature_dim, num_classes=2)
        bank.update(np.asarray(emb), targets)
        acc = contrastive_evaluate(params, bn, imgs, targets, bank, cfg)
        assert acc >= 0.75  # self-retrieval on a separable set


class TestConfusionMatrix:
    def test_counts(self):
        from tpu_ac.cluster.metrics import confusion_matrix
        m = confusion_matrix([0, 1, 1, 0], [0, 1, 0, 0])
        np.testing.assert_array_equal(m, [[2, 1], [0, 1]])


class TestPrototypes:
    def test_get_prototypes_confident_members(self, rng):
        from tpu_ac.train.scan import get_prototypes, init_clustering_model
        params, bn = init_clustering_model(0, TINY)
        imgs = rng.standard_normal((12, 3, 32, 32)).astype(np.float32)
        protos = get_prototypes(params, bn, imgs, TINY)
        assert protos.shape == (TINY.n_clusters,)
        assert all(-1 <= p < 12 for p in protos)

    def test_visualize_indices(self, rng, tmp_path):
        from tpu_ac.viz.plots import visualize_indices
        import os
        imgs = rng.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
        out = str(tmp_path / "protos.png")
        visualize_indices(imgs, [0, 3, 5, -1], save_path=out)
        assert os.path.exists(out)


class TestMemoryBankWrap:
    def test_update_wraps_circularly(self, rng):
        from tpu_ac.train.scan import MemoryBank

        bank = MemoryBank(n=10, dim=4, num_classes=3)
        f = rng.standard_normal((8, 4)).astype(np.float32)
        bank.update(f, np.arange(8))
        f2 = rng.standard_normal((8, 4)).astype(np.float32)
        bank.update(f2, np.arange(8))  # crosses the end: rows 8,9,0..5
        assert bank.ptr == 6
        np.testing.assert_array_equal(bank.features[8], f2[0])
        np.testing.assert_array_equal(bank.features[0], f2[2])
        np.testing.assert_array_equal(bank.features[6], f[6])
