"""Sharded alpha computation on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ac.cluster.alpha import (
    weight_distance_supervised,
    weight_distance_unsupervised,
)
from tpu_ac.distributed import (
    get_mesh,
    shard_batch,
    sharded_weight_distance_unsupervised,
    sharded_weight_distance_supervised,
)


class TestShardedAlpha:
    def test_unsupervised_matches_single_device(self, rng):
        Z = rng.standard_normal((10, 16, 64)).astype(np.float32)  # N=10 pads to 16
        mesh = get_mesh(8)
        z_sh, n = shard_batch(mesh, Z)
        assert z_sh.shape[0] == 16 and n == 10
        w = np.asarray(
            sharded_weight_distance_unsupervised(mesh, z_sh, n_valid=n))[:n]
        want = np.asarray(weight_distance_unsupervised(jnp.asarray(Z),
                                                       impl="xla"))
        # kernel "f32" = compensated decomposition: the j == i self-term
        # carries a ~|z|*2^-9 floor the XLA oracle cancels away, diluted
        # by 1/(n-1) in the mean (see kernels/distances.py)
        np.testing.assert_allclose(w, want, rtol=1e-3, atol=5e-4)

    @pytest.mark.parametrize("n,dp", [
        (10, 8),   # L=2, n_pad=16 (even: exercises the k == H tie-break
                   # AND the padded-row masking)
        (8, 8),    # L=1 (window width == H)
        (13, 5),   # L=3, n_pad=15 ODD (no tie-break branch)
        (6, 2),    # dp=2: window spans n_pad-1 columns
    ])
    def test_triangle_scheme_matches_single_device(self, rng, n, dp):
        """The balanced circulant-window sweep (default) == the XLA oracle.

        Also strictly CLOSER to the oracle than the rect sweep: the
        triangle scheme never computes self-pairs, so the compensated
        kernel's self-distance floor (~|z|*2^-9) never enters the mean.
        """
        Z = rng.standard_normal((n, 16, 64)).astype(np.float32)
        mesh = get_mesh(dp)
        z_sh, nv = shard_batch(mesh, Z)
        got = np.asarray(sharded_weight_distance_unsupervised(
            mesh, z_sh, n_valid=nv, scheme="triangle"))[:n]
        want = np.asarray(weight_distance_unsupervised(jnp.asarray(Z),
                                                       impl="xla"))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_triangle_scheme_bf16(self, rng):
        Z = rng.standard_normal((10, 16, 64)).astype(np.float32)
        mesh = get_mesh(8)
        z_sh, nv = shard_batch(mesh, Z)
        tri = np.asarray(sharded_weight_distance_unsupervised(
            mesh, z_sh, n_valid=nv, precision="bf16"))[:nv]
        rect = np.asarray(sharded_weight_distance_unsupervised(
            mesh, z_sh, n_valid=nv, precision="bf16", scheme="rect"))[:nv]
        np.testing.assert_allclose(tri, rect, rtol=3e-2, atol=3e-2)

    def test_bad_scheme_raises(self, rng):
        Z = rng.standard_normal((4, 8, 32)).astype(np.float32)
        mesh = get_mesh(2)
        z_sh, nv = shard_batch(mesh, Z)
        with pytest.raises(ValueError, match="scheme"):
            sharded_weight_distance_unsupervised(mesh, z_sh, n_valid=nv,
                                                 scheme="diag")

    def test_supervised_matches_single_device(self, rng):
        Z = rng.standard_normal((9, 16, 64)).astype(np.float32)
        Ztr = rng.standard_normal((5, 16, 64)).astype(np.float32)
        mesh = get_mesh(8)
        z_sh, n = shard_batch(mesh, Z)
        w = np.asarray(sharded_weight_distance_supervised(
            mesh, z_sh, jnp.asarray(Ztr)))[:n]
        want = np.asarray(weight_distance_supervised(
            jnp.asarray(Z), jnp.asarray(Ztr), impl="xla"))
        np.testing.assert_allclose(w, want, rtol=2e-4, atol=2e-5)

    def test_sharded_embed_matches_replicated(self, rng):
        """jit auto-partitioning of the embedder over a dp-sharded batch."""
        from tpu_ac.models import ViTConfig, init_vit_params
        from tpu_ac.features import EmbedConfig, embed_vit_features

        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        img_size=32)
        params = init_vit_params(0, cfg)
        ecfg = EmbedConfig(layers=("blocks.0", "blocks.1"),
                           pretrain_embed_dimension=48,
                           target_embed_dimension=96)
        imgs = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
        mesh = get_mesh(8)
        imgs_sh, _ = shard_batch(mesh, imgs)

        fn = jax.jit(lambda x: embed_vit_features(params, x, cfg, ecfg))
        got = np.asarray(fn(imgs_sh))
        want = np.asarray(fn(jnp.asarray(imgs)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestPipelineMeshPath:
    def test_compute_alpha_x_mesh_matches_single(self, rng):
        import jax.numpy as jnp
        from tpu_ac.pipeline import compute_alpha_X

        Z = jnp.asarray(rng.standard_normal((10, 16, 64)).astype(np.float32))
        a_mesh, x_mesh = compute_alpha_X(Z, "unsupervised", 1.0,
                                         use_mesh=True)
        a_one, x_one = compute_alpha_X(Z, "unsupervised", 1.0,
                                       use_mesh=False)
        # mesh path runs the Pallas kernel (compensated f32 self-floor);
        # single-device on CPU runs the XLA formulation — see
        # kernels/distances.py precision notes
        np.testing.assert_allclose(np.asarray(a_mesh), np.asarray(a_one),
                                   rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(np.asarray(x_mesh), np.asarray(x_one),
                                   rtol=2e-3, atol=1e-3)

    def test_supervised_mesh_matches_single(self, rng):
        import jax.numpy as jnp
        from tpu_ac.pipeline import compute_alpha_X

        Z = jnp.asarray(rng.standard_normal((9, 16, 64)).astype(np.float32))
        Zt = jnp.asarray(rng.standard_normal((5, 16, 64)).astype(np.float32))
        a_mesh, _ = compute_alpha_X(Z, "supervised", 1.0, Z_train=Zt,
                                    use_mesh=True)
        a_one, _ = compute_alpha_X(Z, "supervised", 1.0, Z_train=Zt,
                                   use_mesh=False)
        np.testing.assert_allclose(np.asarray(a_mesh), np.asarray(a_one),
                                   rtol=5e-4, atol=1e-6)

    def test_sharded_embed_matches_single_device(self, rng):
        """CategoryEmbedder(mesh=...) shards the batch over dp and must
        reproduce the single-device embeddings exactly (embedding is
        per-image; no cross-device reductions)."""
        import dataclasses

        from tpu_ac.distributed import get_mesh
        from tpu_ac.models import ViTConfig, init_vit_params
        from tpu_ac.pipeline import CategoryEmbedder, PipelineConfig

        vit_cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=4,
                            img_size=32)
        params = init_vit_params(0, vit_cfg)
        cfg = PipelineConfig(layers=("blocks.0", "blocks.1"),
                             pretrain_embed_dimension=96,
                             target_embed_dimension=192,
                             imagesize=32, batch_size=8)
        imgs = rng.integers(0, 255, (11, 3, 32, 32)).astype(np.uint8)
        single = CategoryEmbedder(params, vit_cfg, cfg, mesh=None)
        sharded = CategoryEmbedder(params, vit_cfg, cfg, mesh=get_mesh())
        assert sharded.mesh is not None
        z1 = np.asarray(single(imgs))
        z8 = np.asarray(sharded(imgs))
        np.testing.assert_allclose(z8, z1, rtol=2e-5, atol=2e-6)

    def test_auto_mesh_selection(self):
        """mesh="auto" engages only when batch_size divides device_count."""
        from tpu_ac.models import ViTConfig, init_vit_params
        from tpu_ac.pipeline import CategoryEmbedder, PipelineConfig

        vit_cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=4,
                            img_size=32)
        params = init_vit_params(0, vit_cfg)
        on = CategoryEmbedder(params, vit_cfg,
                              PipelineConfig(imagesize=32, batch_size=8),
                              mesh="auto")
        off = CategoryEmbedder(params, vit_cfg,
                               PipelineConfig(imagesize=32, batch_size=6),
                               mesh="auto")
        assert on.mesh is not None and off.mesh is None


class TestShardedKNN:
    """ops.distances.knn_sharded: bank row-sharded over the dp mesh,
    per-device top-k + one all_gather merge — must be EXACTLY knn."""

    def test_matches_single_device(self, rng):
        from tpu_ac.ops.distances import knn, knn_sharded

        q = rng.standard_normal((9, 24)).astype(np.float32)
        bank = rng.standard_normal((103, 24)).astype(np.float32)  # 103 % 8 != 0
        mesh = get_mesh(8)
        d2_s, idx_s = knn_sharded(jnp.asarray(q), jnp.asarray(bank), 3, mesh)
        d2, idx = knn(jnp.asarray(q), jnp.asarray(bank), 3)
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx))
        np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2),
                                   rtol=1e-6, atol=1e-6)

    def test_small_bank_falls_back(self, rng):
        """shard_rows < k cannot satisfy a local top-k; falls back to the
        single-device search and stays correct."""
        from tpu_ac.ops.distances import knn, knn_sharded

        q = rng.standard_normal((4, 8)).astype(np.float32)
        bank = rng.standard_normal((10, 8)).astype(np.float32)  # 2 rows/device
        d2_s, idx_s = knn_sharded(jnp.asarray(q), jnp.asarray(bank), 4,
                                  get_mesh(8))
        d2, idx = knn(jnp.asarray(q), jnp.asarray(bank), 4)
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx))

    def test_scorer_with_mesh(self, rng):
        """NearestNeighbourScorer(mesh=...) reproduces the single-device
        scorer (detect-path multi-chip search)."""
        from tpu_ac.detect.scorer import NearestNeighbourScorer

        feats = [rng.standard_normal((130, 48)).astype(np.float32)]
        queries = [rng.standard_normal((37, 48)).astype(np.float32)]
        plain = NearestNeighbourScorer(n_nearest_neighbours=3)
        plain.fit(feats)
        sharded = NearestNeighbourScorer(n_nearest_neighbours=3,
                                         mesh=get_mesh(8))
        sharded.fit(feats)
        s1, d1, i1 = plain.predict(queries)
        s8, d8, i8 = sharded.predict(queries)
        np.testing.assert_array_equal(i8, i1)
        np.testing.assert_allclose(s8, s1, rtol=1e-6, atol=1e-6)

    def test_knn_ip_sharded_matches(self, rng):
        """knn_ip_sharded (SCAN's multi-GPU faiss IndexFlatIP equivalent)
        is exactly knn_ip, including via MemoryBank neighbor mining."""
        from tpu_ac.ops.distances import knn_ip, knn_ip_sharded
        from tpu_ac.train.scan import MemoryBank

        feats = rng.standard_normal((101, 32)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        mesh = get_mesh(8)
        s_s, i_s = knn_ip_sharded(jnp.asarray(feats), jnp.asarray(feats),
                                  6, mesh)
        s_1, i_1 = knn_ip(jnp.asarray(feats), jnp.asarray(feats), 6)
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_1))
        np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_1),
                                   rtol=1e-6, atol=1e-6)

        targets = rng.integers(0, 5, 101)
        plain = MemoryBank(101, 32, 5)
        plain.update(feats, targets)
        sharded = MemoryBank(101, 32, 5, mesh=mesh)
        sharded.update(feats, targets)
        idx1, acc1 = plain.mine_nearest_neighbors(5)
        idx8, acc8 = sharded.mine_nearest_neighbors(5)
        np.testing.assert_array_equal(idx8, idx1)
        assert acc8 == acc1


class TestGetMesh:
    def test_oversubscription_rejected(self):
        """get_mesh must not silently truncate to the available devices —
        a truncated mesh would run (and AOT-export, cli/export --dp) a
        different topology than requested."""
        import pytest

        from tpu_ac.distributed import get_mesh

        with pytest.raises(ValueError, match="devices are available"):
            get_mesh(1000)

    def test_mesh_rejected_for_approximate_scorer(self):
        """--dp only shards the exact scorer; combining it with ivfpq /
        ivfflat must fail loudly instead of silently running
        single-device."""
        import pytest

        from tpu_ac.detect.patchcore import PatchCore
        from tpu_ac.distributed import get_mesh

        with pytest.raises(ValueError, match="exact"):
            PatchCore(lambda x: x, nn_method="ivfpq", mesh=get_mesh(2))


class TestScanTrainDP:
    """dp-sharded SCAN train steps (train.scan.dp_shard_step) must be
    numerically equivalent to the single-device steps — GSPMD partitions
    the SAME program (sync-BN batch stats, NT-Xent all-pairs, grad sums
    lower to collectives), so only reduction order may differ.  The raw
    noise is ~1e-7 f32 per reduction, but gradients through BN's
    rsqrt(var+eps) amplify it data-dependently (measured up to ~6e-5 on
    BN params after ONE step), so the state check is loose while the loss
    check is tight; compared after one step only — momentum compounds the
    wiggle chaotically beyond that."""

    def _models(self):
        from tpu_ac.models.resnet_cifar import CifarResNetConfig
        from tpu_ac.train.scan import SCANModelConfig

        backbone = CifarResNetConfig(block_counts=(1, 1, 1, 1),
                                     widths=(8, 16, 32, 64))
        return SCANModelConfig(backbone=backbone, feature_dim=16,
                               n_clusters=4, n_heads=2)

    def _assert_states_close(self, a, b):
        import jax

        for (ka, va), (kb, vb) in zip(
                sorted(a.params.items()), sorted(b.params.items())):
            assert ka == kb
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=5e-3, atol=5e-4, err_msg=ka)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=5e-3, atol=5e-4),
            a.bn_state, b.bn_state)

    def test_simclr_step_dp_matches_single(self, rng):
        import optax

        # hermetic rng: the dp-vs-single tolerances are margin
        # asserts and must not depend on the shared session
        # stream's position (a near-zero weight element can
        # otherwise drift past atol under sgd+momentum)
        rng = np.random.default_rng(21)

        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.scan import (
            dp_shard_step,
            init_contrastive_model,
            init_train_state,
            make_simclr_step,
        )

        mcfg = self._models()
        opt = optax.sgd(0.1, momentum=0.9)
        params, bn = init_contrastive_model(0, mcfg)
        raw = make_simclr_step(mcfg, opt, temperature=0.1)
        xi = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)
        xj = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)

        s0 = init_train_state(params, bn, opt)
        s1 = init_train_state(params, bn, opt)
        sharded = dp_shard_step(raw, get_mesh(8), n_batch_args=2)
        s0, loss_single = jax.jit(raw)(s0, xi, xj)
        s1, loss_dp = sharded(s1, xi, xj)
        np.testing.assert_allclose(float(loss_dp), float(loss_single),
                                   rtol=2e-4)
        self._assert_states_close(s0, s1)

    def test_scan_step_dp_matches_single(self, rng):
        import optax

        # hermetic rng: the dp-vs-single tolerances are margin
        # asserts and must not depend on the shared session
        # stream's position (a near-zero weight element can
        # otherwise drift past atol under sgd+momentum)
        rng = np.random.default_rng(22)

        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.scan import (
            dp_shard_step,
            init_clustering_model,
            init_train_state,
            make_scan_step,
        )

        mcfg = self._models()
        # sgd, not the CLI's adam: adam's first step is ~lr*sign(grad), so a
        # 1e-7 reduction-order wiggle on a near-zero gradient flips the sign
        # into a 2*lr param difference — an adam property, not a sharding one
        opt = optax.sgd(1e-2, momentum=0.9)
        params, bn = init_clustering_model(0, mcfg)
        raw = make_scan_step(mcfg, opt, entropy_weight=2.0)
        anchors = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)
        nbrs = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)

        s0 = init_train_state(params, bn, opt)
        s1 = init_train_state(params, bn, opt)
        sharded = dp_shard_step(raw, get_mesh(8), n_batch_args=2)
        s0, m_single = jax.jit(raw)(s0, anchors, nbrs)
        s1, m_dp = sharded(s1, anchors, nbrs)
        np.testing.assert_allclose(np.asarray(m_dp["head_losses"]),
                                   np.asarray(m_single["head_losses"]),
                                   rtol=2e-4)
        self._assert_states_close(s0, s1)

    def test_selflabel_step_dp_matches_single(self, rng):
        import optax

        # hermetic rng: the dp-vs-single tolerances are margin
        # asserts and must not depend on the shared session
        # stream's position (a near-zero weight element can
        # otherwise drift past atol under sgd+momentum)
        rng = np.random.default_rng(23)

        from tpu_ac.distributed import get_mesh
        from tpu_ac.train.scan import (
            dp_shard_step,
            init_clustering_model,
            init_train_state,
            make_selflabel_step,
        )

        mcfg = self._models()
        mcfg = type(mcfg)(backbone=mcfg.backbone, feature_dim=16,
                          n_clusters=4, n_heads=1)
        opt = optax.sgd(0.03, momentum=0.9)
        params, bn = init_clustering_model(0, mcfg)
        # a threshold of 0 keeps every pseudo-label so the loss is nonzero
        raw = make_selflabel_step(mcfg, opt, threshold=0.0)
        weak = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)
        strong = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)

        s0 = init_train_state(params, bn, opt)
        s1 = init_train_state(params, bn, opt)
        sharded = dp_shard_step(raw, get_mesh(8), n_batch_args=2)
        s0, loss_single = jax.jit(raw)(s0, weak, strong)
        s1, loss_dp = sharded(s1, weak, strong)
        np.testing.assert_allclose(float(loss_dp), float(loss_single),
                                   rtol=2e-4, atol=1e-6)
        self._assert_states_close(s0, s1)
