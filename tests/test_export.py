"""AOT serving export (tpu_ac/utils/export.py): the serialized StableHLO
programs must reproduce the live pipeline exactly after a bytes round-trip.

The reference has no AOT story (every deployment re-traces Python); this
is a TPU-native addition, so the oracle is our own live path.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    from tpu_ac.models.registry import BackboneSpec, register_backbone
    from tpu_ac.models.vit import ViTConfig
    from tpu_ac.pipeline import PipelineConfig, build_embedder_for_config

    register_backbone("tiny_test_export", BackboneSpec(
        "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                         img_size=32), None))
    cfg = PipelineConfig(backbone_name="tiny_test_export",
                         layers=("blocks.0", "blocks.1"),
                         pretrain_embed_dimension=48,
                         target_embed_dimension=96,
                         imagesize=32, batch_size=4, tau=1.0)
    emb = build_embedder_for_config(cfg, mesh=None)
    return cfg, emb


class TestExport:
    def test_round_trip_matches_live_pipeline(self, tiny_setup, tmp_path):
        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_category_programs,
                                         load_exported, save_exported)

        cfg, emb = tiny_setup
        blob = export_category_programs(emb, cfg, n_images=8)
        path = save_exported(str(tmp_path / "serving.tpuac"), blob)
        progs = load_exported(path)

        assert progs["meta"]["n_images_capacity"] == 32  # 8 -> 32-bucket
        assert progs["meta"]["supervised"] == "unsupervised"
        assert progs["meta"]["image_dtype"] == "uint8"

        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (4, 3, 32, 32), dtype=np.uint8)

        z_live = np.asarray(emb(images))
        params = {k: np.asarray(v) for k, v in emb._device_params.items()}
        z_aot = np.asarray(progs["embed"](params, images))
        np.testing.assert_array_equal(z_aot, z_live)

        n, p, d = 6, z_live.shape[1], z_live.shape[2]
        Z = rng.standard_normal((n, p, d)).astype(np.float32)
        packed_live = np.asarray(compute_alpha_X(
            Z, "unsupervised", cfg.tau, use_mesh=False,
            precision=cfg.resolved_alpha_precision, packed=True))
        z_pad = np.zeros((32, p, d), np.float32)
        z_pad[:n] = Z
        packed_aot = np.asarray(
            progs["alpha_x"](z_pad, np.int32(n)))[:n]
        np.testing.assert_array_equal(packed_aot, packed_live)

    def test_supervised_mode_exports(self, tiny_setup, tmp_path):
        import dataclasses

        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_category_programs,
                                         load_exported, save_exported)

        cfg, emb = tiny_setup
        scfg = dataclasses.replace(cfg, supervised="supervised")
        blob = export_category_programs(emb, scfg, n_images=4)
        progs = load_exported(save_exported(
            str(tmp_path / "sup.tpuac"), blob))

        rng = np.random.default_rng(1)
        p = progs["meta"]["n_patches"]
        d = progs["meta"]["embed_dim"]
        Z = rng.standard_normal((3, p, d)).astype(np.float32)
        Zt = rng.standard_normal((2, p, d)).astype(np.float32)
        packed_live = np.asarray(compute_alpha_X(
            Z, "supervised", scfg.tau, Z_train=Zt, use_mesh=False,
            precision=scfg.resolved_alpha_precision, packed=True))
        z_pad = np.zeros((32, p, d), np.float32)
        zt_pad = np.zeros((32, p, d), np.float32)
        z_pad[:3], zt_pad[:2] = Z, Zt
        packed_aot = np.asarray(progs["alpha_x"](
            z_pad, zt_pad, np.int32(3), np.int32(2)))[:3]
        np.testing.assert_array_equal(packed_aot, packed_live)

    def test_separate_train_capacity(self, tiny_setup, tmp_path):
        """--n_train_images buckets the supervised train bank independently
        of the test capacity (a real MVTec train split is ~200+ images;
        coupling it to --n_images would inflate the O(cap^2) alpha work)."""
        import dataclasses

        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_category_programs,
                                         load_exported, save_exported)

        cfg, emb = tiny_setup
        scfg = dataclasses.replace(cfg, supervised="supervised")
        blob = export_category_programs(emb, scfg, n_images=4,
                                        n_train_images=40)
        progs = load_exported(save_exported(
            str(tmp_path / "sup_tc.tpuac"), blob))
        assert progs["meta"]["n_images_capacity"] == 32
        assert progs["meta"]["n_train_capacity"] == 64  # 40 -> 32-bucket

        rng = np.random.default_rng(3)
        p = progs["meta"]["n_patches"]
        d = progs["meta"]["embed_dim"]
        Z = rng.standard_normal((3, p, d)).astype(np.float32)
        Zt = rng.standard_normal((40, p, d)).astype(np.float32)
        packed_live = np.asarray(compute_alpha_X(
            Z, "supervised", scfg.tau, Z_train=Zt, use_mesh=False,
            precision=scfg.resolved_alpha_precision, packed=True))
        z_pad = np.zeros((32, p, d), np.float32)
        zt_pad = np.zeros((64, p, d), np.float32)
        z_pad[:3], zt_pad[:40] = Z, Zt
        packed_aot = np.asarray(progs["alpha_x"](
            z_pad, zt_pad, np.int32(3), np.int32(40)))[:3]
        np.testing.assert_array_equal(packed_aot, packed_live)

    def test_mesh_embedder_rejected(self, tiny_setup):
        from tpu_ac.utils.export import export_category_programs

        cfg, emb = tiny_setup

        class FakeMeshEmbedder:
            mesh = object()

        with pytest.raises(ValueError, match="single-device"):
            export_category_programs(FakeMeshEmbedder(), cfg, n_images=4)

    def test_version_gate(self, tiny_setup, tmp_path):
        import pickle

        from tpu_ac.utils.export import load_exported

        path = tmp_path / "bad.tpuac"
        path.write_bytes(pickle.dumps({"format_version": 999}))
        with pytest.raises(ValueError, match="format"):
            load_exported(str(path))

    def test_multi_platform_export(self, tiny_setup, tmp_path):
        # one artifact lowered for both cpu and tpu; still runnable on the
        # cpu host after the bytes round-trip
        from tpu_ac.utils.export import (export_category_programs,
                                         load_exported, save_exported)

        cfg, emb = tiny_setup
        blob = export_category_programs(emb, cfg, n_images=4,
                                        platforms=("cpu", "tpu"))
        assert blob["meta"]["platforms"] == ["cpu", "tpu"]
        progs = load_exported(save_exported(
            str(tmp_path / "mp.tpuac"), blob))
        rng = np.random.default_rng(2)
        images = rng.integers(0, 255, (4, 3, 32, 32), dtype=np.uint8)
        params = {k: np.asarray(v) for k, v in emb._device_params.items()}
        z = np.asarray(progs["embed"](params, images))
        np.testing.assert_array_equal(z, np.asarray(emb(images)))


@pytest.fixture(scope="module")
def sharded_setup():
    import dataclasses

    from tpu_ac.distributed import get_mesh
    from tpu_ac.pipeline import build_embedder_for_config

    # reuse the registry entry from tiny_setup's module scope is not
    # guaranteed to have run first; register idempotently here
    from tpu_ac.models.registry import BackboneSpec, register_backbone
    from tpu_ac.models.vit import ViTConfig
    from tpu_ac.pipeline import PipelineConfig

    register_backbone("tiny_test_export_sh", BackboneSpec(
        "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                         img_size=32), None))
    cfg = PipelineConfig(backbone_name="tiny_test_export_sh",
                         layers=("blocks.0", "blocks.1"),
                         pretrain_embed_dimension=48,
                         target_embed_dimension=96,
                         imagesize=32, batch_size=8, tau=1.0)
    mesh = get_mesh(8)
    emb = build_embedder_for_config(cfg, mesh=mesh)
    return cfg, emb, mesh


class TestShardedExport:
    def test_sharded_round_trip_matches_single_device(self, sharded_setup,
                                                      tmp_path):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_sharded_category_programs,
                                         load_exported, save_exported)

        cfg, emb, mesh = sharded_setup
        blob = export_sharded_category_programs(emb, cfg, n_images=8)
        progs = load_exported(save_exported(
            str(tmp_path / "sharded.tpuac"), blob))
        meta = progs["meta"]
        assert meta["sharded"] and meta["n_devices"] == 8
        assert meta["n_images_capacity"] == 32  # lcm(32, 8) bucket

        row_sh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (8, 3, 32, 32), dtype=np.uint8)
        z_live = np.asarray(emb(images))
        params = jax.device_put(dict(emb._device_params), repl)
        z_aot = np.asarray(progs["embed"](
            params, jax.device_put(images, row_sh)))
        np.testing.assert_allclose(z_aot, z_live, rtol=1e-5, atol=1e-6)

        n, p, d = 13, z_live.shape[1], z_live.shape[2]
        Z = rng.standard_normal((n, p, d)).astype(np.float32)
        z_pad = np.zeros((meta["n_images_capacity"], p, d), np.float32)
        z_pad[:n] = Z
        packed = np.asarray(progs["alpha_x"](
            jax.device_put(z_pad, row_sh),
            jax.device_put(np.int32(n), repl)))[:n]
        a_one, x_one = compute_alpha_X(
            Z, "unsupervised", cfg.tau, use_mesh=False,
            precision=cfg.resolved_alpha_precision)
        # cross-shard reduction order differs from the fused single-device
        # program — same band as tests/test_distributed.py's mesh-vs-single
        np.testing.assert_allclose(packed[:, :p], np.asarray(a_one),
                                   rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(packed[:, p:], np.asarray(x_one),
                                   rtol=2e-3, atol=1e-3)

    def test_sharded_supervised(self, sharded_setup, tmp_path):
        import dataclasses

        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_sharded_category_programs,
                                         load_exported, save_exported)

        cfg, emb, mesh = sharded_setup
        scfg = dataclasses.replace(cfg, supervised="supervised")
        blob = export_sharded_category_programs(emb, scfg, n_images=8)
        progs = load_exported(save_exported(
            str(tmp_path / "sharded_sup.tpuac"), blob))

        row_sh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        rng = np.random.default_rng(1)
        p, d = progs["meta"]["n_patches"], progs["meta"]["embed_dim"]
        cap = progs["meta"]["n_images_capacity"]
        Z = rng.standard_normal((5, p, d)).astype(np.float32)
        Zt = rng.standard_normal((3, p, d)).astype(np.float32)
        z_pad = np.zeros((cap, p, d), np.float32)
        zt_pad = np.zeros((cap, p, d), np.float32)
        z_pad[:5], zt_pad[:3] = Z, Zt
        packed = np.asarray(progs["alpha_x"](
            jax.device_put(z_pad, row_sh),
            jax.device_put(zt_pad, repl),
            jax.device_put(np.int32(5), repl),
            jax.device_put(np.int32(3), repl)))[:5]
        a_one, x_one = compute_alpha_X(
            Z, "supervised", scfg.tau, Z_train=Zt, use_mesh=False,
            precision=scfg.resolved_alpha_precision)
        np.testing.assert_allclose(packed[:, :p], np.asarray(a_one),
                                   rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(packed[:, p:], np.asarray(x_one),
                                   rtol=2e-3, atol=1e-3)

    def test_meshless_embedder_rejected(self, tiny_setup):
        from tpu_ac.utils.export import export_sharded_category_programs

        cfg, emb = tiny_setup
        with pytest.raises(ValueError, match="mesh"):
            export_sharded_category_programs(emb, cfg, n_images=4)

    def test_cli_dp_flag(self, sharded_setup, tmp_path):
        from tpu_ac.cli.export import main
        from tpu_ac.utils.export import load_exported

        out = str(tmp_path / "cli_sharded.tpuac")
        main(["--backbone_name", "tiny_test_export_sh",
              "--layers_to_extract_from", "blocks.0", "blocks.1",
              "--pretrain_embed_dimension", "48",
              "--target_embed_dimension", "96",
              "--imagesize", "32", "--batch_size", "8",
              "--n_images", "8", "--dp", "8", "--output", out])
        meta = load_exported(out)["meta"]
        assert meta["sharded"] and meta["n_devices"] == 8


class TestExportCLI:
    def test_cli_end_to_end(self, tiny_setup, tmp_path, capsys):
        from tpu_ac.cli.export import main
        from tpu_ac.utils.export import load_exported

        out = str(tmp_path / "cli_serving.tpuac")
        path = main(["--backbone_name", "tiny_test_export",
                     "--layers_to_extract_from", "blocks.0", "blocks.1",
                     "--pretrain_embed_dimension", "48",
                     "--target_embed_dimension", "96",
                     "--imagesize", "32", "--batch_size", "4",
                     "--n_images", "8", "--output", out])
        assert path == out and out in capsys.readouterr().out
        progs = load_exported(out)
        assert progs["meta"]["backbone_name"] == "tiny_test_export"
        rng = np.random.default_rng(3)
        images = rng.integers(0, 255, (4, 3, 32, 32), dtype=np.uint8)
        _, emb = tiny_setup
        params = {k: np.asarray(v) for k, v in emb._device_params.items()}
        z = np.asarray(progs["embed"](params, images))
        assert z.shape == (4, progs["meta"]["n_patches"],
                           progs["meta"]["embed_dim"])

    def test_artifact_runs_without_tpu_ac(self, tiny_setup, tmp_path):
        """The serving-host claim: a process that never imports tpu_ac can
        run the artifact with raw pickle + jax.export."""
        import os
        import subprocess
        import sys

        from tpu_ac.utils.export import (export_category_programs,
                                         save_exported)

        cfg, emb = tiny_setup
        path = save_exported(str(tmp_path / "standalone.tpuac"),
                             export_category_programs(emb, cfg, n_images=4))
        np.save(tmp_path / "params.npy",
                {k: np.asarray(v) for k, v in emb._device_params.items()},
                allow_pickle=True)
        code = f"""
import sys
assert not any(m.startswith("tpu_ac") for m in sys.modules)
import pickle
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport
blob = pickle.load(open({str(path)!r}, "rb"))
embed = jexport.deserialize(blob["embed"]).call
alpha_x = jexport.deserialize(blob["alpha_x"]).call
params = np.load({str(tmp_path / "params.npy")!r}, allow_pickle=True).item()
imgs = np.zeros((4, 3, 32, 32), np.uint8)
z = np.asarray(embed(params, imgs))
cap = blob["meta"]["n_images_capacity"]
z_pad = np.zeros((cap, z.shape[1], z.shape[2]), np.float32)
z_pad[:4] = np.random.default_rng(0).standard_normal((4, *z.shape[1:]))
packed = np.asarray(alpha_x(z_pad, None, np.int32(4), None))[:4]
assert np.isfinite(packed).all()
assert not any(m.startswith("tpu_ac") for m in sys.modules)
print("STANDALONE_OK", z.shape, packed.shape)
"""
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        assert "STANDALONE_OK" in proc.stdout

    def test_serving_host_script(self, tiny_setup, tmp_path):
        """scripts/serving_host.py (the standalone example host) serves a
        category end-to-end and matches the live pipeline exactly."""
        import os
        import subprocess
        import sys

        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_category_programs,
                                         save_exported)

        cfg, emb = tiny_setup
        path = save_exported(str(tmp_path / "host.tpuac"),
                             export_category_programs(emb, cfg, n_images=8))
        np.save(tmp_path / "params.npy",
                {k: np.asarray(v) for k, v in emb._device_params.items()},
                allow_pickle=True)
        rng = np.random.default_rng(7)
        # 6 images: one full batch of 4 + a tail batch the host must pad
        images = rng.integers(0, 255, (6, 3, 32, 32), dtype=np.uint8)
        np.save(tmp_path / "imgs.npy", images)

        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "serving_host.py")
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, script, path,
             "--params", str(tmp_path / "params.npy"),
             "--images", str(tmp_path / "imgs.npy"),
             "--out", str(tmp_path / "out.npz"), "--platform", "cpu"],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        out = np.load(tmp_path / "out.npz")

        z_live = np.asarray(emb(images))
        packed_live = np.asarray(compute_alpha_X(
            z_live, "unsupervised", cfg.tau, use_mesh=False,
            precision=cfg.resolved_alpha_precision, packed=True))
        p = z_live.shape[1]
        np.testing.assert_array_equal(out["alpha"], packed_live[:, :p])
        np.testing.assert_array_equal(out["X"], packed_live[:, p:])
        np.testing.assert_allclose(out["alpha"].sum(axis=1), 1.0,
                                   atol=1e-5)

    def test_serving_host_script_supervised(self, tiny_setup, tmp_path):
        """Supervised artifacts: the host embeds the --train_images bank
        and calls the 4-arg alpha signature; matches the live pipeline."""
        import dataclasses
        import os
        import subprocess
        import sys

        from tpu_ac.pipeline import compute_alpha_X
        from tpu_ac.utils.export import (export_category_programs,
                                         save_exported)

        cfg, emb = tiny_setup
        scfg = dataclasses.replace(cfg, supervised="supervised")
        path = save_exported(str(tmp_path / "sup_host.tpuac"),
                             export_category_programs(emb, scfg,
                                                      n_images=8))
        np.save(tmp_path / "params.npy",
                {k: np.asarray(v) for k, v in emb._device_params.items()},
                allow_pickle=True)
        rng = np.random.default_rng(13)
        images = rng.integers(0, 255, (5, 3, 32, 32), dtype=np.uint8)
        train = rng.integers(0, 255, (6, 3, 32, 32), dtype=np.uint8)
        np.save(tmp_path / "imgs.npy", images)
        np.save(tmp_path / "train.npy", train)

        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "serving_host.py")
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, script, path,
             "--params", str(tmp_path / "params.npy"),
             "--images", str(tmp_path / "imgs.npy"),
             "--train_images", str(tmp_path / "train.npy"),
             "--out", str(tmp_path / "out_sup.npz"), "--platform", "cpu"],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        out = np.load(tmp_path / "out_sup.npz")

        z_live = np.asarray(emb(images))
        zt_live = np.asarray(emb(train))
        packed_live = np.asarray(compute_alpha_X(
            z_live, "supervised", scfg.tau, Z_train=zt_live,
            use_mesh=False, precision=scfg.resolved_alpha_precision,
            packed=True))
        p = z_live.shape[1]
        np.testing.assert_array_equal(out["alpha"], packed_live[:, :p])
        np.testing.assert_array_equal(out["X"], packed_live[:, p:])

    def test_serving_host_refuses_real_images_without_train(
            self, tiny_setup, tmp_path):
        """A supervised artifact served with real --images but no
        --train_images must FAIL loudly — silently substituting a
        synthetic train bank would write garbage alpha/X with exit 0
        (the synthetic bank is only for --bench/synthetic runs)."""
        import dataclasses
        import os
        import subprocess
        import sys

        from tpu_ac.utils.export import (export_category_programs,
                                         save_exported)

        cfg, emb = tiny_setup
        scfg = dataclasses.replace(cfg, supervised="supervised")
        path = save_exported(str(tmp_path / "sup_guard.tpuac"),
                             export_category_programs(emb, scfg,
                                                      n_images=8))
        np.save(tmp_path / "params.npy",
                {k: np.asarray(v) for k, v in emb._device_params.items()},
                allow_pickle=True)
        rng = np.random.default_rng(14)
        np.save(tmp_path / "imgs.npy",
                rng.integers(0, 255, (5, 3, 32, 32), dtype=np.uint8))

        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "serving_host.py")
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, script, path,
             "--params", str(tmp_path / "params.npy"),
             "--images", str(tmp_path / "imgs.npy"),
             "--out", str(tmp_path / "out_guard.npz"), "--platform", "cpu"],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode != 0
        assert "train_images" in proc.stderr
        assert not (tmp_path / "out_guard.npz").exists()

    def test_serving_host_script_sharded(self, tiny_setup, tmp_path):
        """The standalone host also serves --dp artifacts: it builds the
        mesh from meta, shards image/Z rows, and matches the live
        single-device pipeline."""
        import os
        import subprocess
        import sys

        from tpu_ac.distributed import get_mesh
        from tpu_ac.pipeline import (build_embedder_for_config,
                                     compute_alpha_X)
        from tpu_ac.utils.export import (export_sharded_category_programs,
                                         save_exported)

        import dataclasses

        cfg, emb_single = tiny_setup
        cfg = dataclasses.replace(cfg, batch_size=8)  # dp must divide bs
        emb = build_embedder_for_config(cfg, mesh=get_mesh(8))
        path = save_exported(
            str(tmp_path / "host8.tpuac"),
            export_sharded_category_programs(emb, cfg, n_images=8))
        np.save(tmp_path / "params8.npy",
                {k: np.asarray(v) for k, v in emb._device_params.items()},
                allow_pickle=True)
        rng = np.random.default_rng(11)
        images = rng.integers(0, 255, (6, 3, 32, 32), dtype=np.uint8)
        np.save(tmp_path / "imgs8.npy", images)

        script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "serving_host.py")
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        proc = subprocess.run(
            [sys.executable, script, path,
             "--params", str(tmp_path / "params8.npy"),
             "--images", str(tmp_path / "imgs8.npy"),
             "--out", str(tmp_path / "out8.npz"), "--platform", "cpu"],
            env=env, capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr
        out = np.load(tmp_path / "out8.npz")

        z_live = np.asarray(emb_single(images))
        packed_live = np.asarray(compute_alpha_X(
            z_live, "unsupervised", cfg.tau, use_mesh=False,
            precision=cfg.resolved_alpha_precision, packed=True))
        p = z_live.shape[1]
        # sharded weights reassociate the distance sums -> float-tolerance
        np.testing.assert_allclose(out["alpha"], packed_live[:, :p],
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(out["X"], packed_live[:, p:],
                                   rtol=1e-3, atol=1e-3)

    def test_average_mode_rejected(self, tiny_setup):
        import dataclasses

        from tpu_ac.utils.export import export_category_programs

        cfg, emb = tiny_setup
        acfg = dataclasses.replace(cfg, supervised="average")
        with pytest.raises(ValueError, match="not exportable"):
            export_category_programs(emb, acfg, n_images=4)
