"""TPU-baked serving-artifact drive (two serialized TPU processes).

Verifies the deployment claim end-to-end ON the chip: an artifact
exported from a TPU-backed process (which bakes the fused Pallas alpha
kernel, see tpu_ac/utils/export.py) is loaded by a serving host that
never imports tpu_ac and reproduces the live pipeline bit-exactly.

Run each phase as its own process (one TPU claim at a time; wait
~60-120 s between them for the tile claim to release):

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/drive_export_tpu.py phase1 --workdir /root/tmpw
    sleep 90
    PYTHONPATH=/root/.axon_site \
        python scripts/drive_export_tpu.py phase2 --workdir /root/tmpw

Phase 2 deliberately drops /root/repo from PYTHONPATH so tpu_ac is not
even importable.  Last verified 2026-08-18: EMBED_EXACT + ALPHA_EXACT +
TPU_SERVING_OK at the flagship config (dino_vitbase8, blocks.10+11,
2048->4096, batch 8, alpha capacity 32).
"""

import argparse
import os
import sys


def phase1(workdir: str) -> None:
    """Export ON the TPU and record live-pipeline ground truth."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_compilation"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_ac.pipeline import (PipelineConfig, build_embedder_for_config,
                                 compute_alpha_X)
    from tpu_ac.utils.export import export_category_programs, save_exported

    print("platform:", jax.devices()[0].platform, flush=True)
    assert jax.devices()[0].platform != "cpu", "need the TPU for this drive"

    cfg = PipelineConfig(backbone_name="dino_vitbase8",
                         layers=("blocks.10", "blocks.11"),
                         pretrain_embed_dimension=2048,
                         target_embed_dimension=4096,
                         imagesize=224, batch_size=8, tau=1.0)
    emb = build_embedder_for_config(cfg, mesh=None)

    blob = export_category_programs(emb, cfg, n_images=32)
    path = save_exported(os.path.join(workdir, "serving_tpu.tpuac"), blob)
    print("exported", path, "platforms=", blob["meta"]["platforms"],
          flush=True)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (8, 3, 224, 224), dtype=np.uint8)
    z_live = np.asarray(emb(images))
    print("embed live done", z_live.shape, flush=True)

    n, p, d = 12, z_live.shape[1], z_live.shape[2]
    Z = rng.standard_normal((n, p, d)).astype(np.float32)
    packed_live = np.asarray(compute_alpha_X(
        Z, "unsupervised", cfg.tau, use_mesh=False,
        precision=cfg.resolved_alpha_precision, packed=True))
    print("alpha live done", packed_live.shape, flush=True)

    np.save(os.path.join(workdir, "params.npy"),
            {k: np.asarray(v) for k, v in emb._device_params.items()},
            allow_pickle=True)
    np.savez(os.path.join(workdir, "truth.npz"), images=images,
             z_live=z_live, Z=Z, packed_live=packed_live)
    print("TRUTH_SAVED", flush=True)


def phase2(workdir: str) -> None:
    """Serving host: raw pickle + jax.export, no tpu_ac import, on TPU."""
    assert not any(m.startswith("tpu_ac") for m in sys.modules)

    import pickle

    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_compilation"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("platform:", jax.devices()[0].platform, flush=True)
    assert jax.devices()[0].platform != "cpu", "need the TPU for this drive"

    from jax import export as jexport

    blob = pickle.load(open(os.path.join(workdir, "serving_tpu.tpuac"),
                            "rb"))
    print("artifact platforms:", blob["meta"]["platforms"], flush=True)
    embed = jexport.deserialize(blob["embed"]).call
    alpha_x = jexport.deserialize(blob["alpha_x"]).call

    params = np.load(os.path.join(workdir, "params.npy"),
                     allow_pickle=True).item()
    t = np.load(os.path.join(workdir, "truth.npz"))

    z = np.asarray(embed(params, t["images"]))
    np.testing.assert_array_equal(z, t["z_live"])
    print("EMBED_EXACT", z.shape, flush=True)

    Z = t["Z"]
    n = Z.shape[0]
    cap = blob["meta"]["n_images_capacity"]
    z_pad = np.zeros((cap, Z.shape[1], Z.shape[2]), np.float32)
    z_pad[:n] = Z
    packed = np.asarray(alpha_x(z_pad, None, np.int32(n), None))[:n]
    np.testing.assert_array_equal(packed, t["packed_live"])
    print("ALPHA_EXACT", packed.shape, flush=True)

    assert not any(m.startswith("tpu_ac") for m in sys.modules)
    print("TPU_SERVING_OK", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("phase", choices=["phase1", "phase2"])
    ap.add_argument("--workdir", default="/root/tmpw")
    a = ap.parse_args()
    os.makedirs(a.workdir, exist_ok=True)
    (phase1 if a.phase == "phase1" else phase2)(a.workdir)
