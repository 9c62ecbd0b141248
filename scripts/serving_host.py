"""Standalone serving host for tpu_ac AOT artifacts — NO tpu_ac import.

Demonstrates the deployment contract end to end: everything a serving
process needs is the ``.tpuac`` artifact (StableHLO programs + meta), a
params file, and stock jax + numpy.  The model code, the Pallas kernel
source, and the whole tpu_ac package are NOT required at serving time.

    # produce the inputs (any tpu_ac-equipped host):
    python -m tpu_ac.cli.export --backbone_name dino_vitbase8 \
        --n_images 32 --output serving.tpuac --dump_params params.npy

    # serve (this script; a different machine/venv is fine):
    python scripts/serving_host.py serving.tpuac --params params.npy \
        --images category_images.npy        # [N,3,H,W] uint8
    python scripts/serving_host.py serving.tpuac --params params.npy \
        --bench                             # synthetic-image throughput

Outputs alpha ([N, P] per-image patch weights) and X ([N, D] weighted
embeddings) — the same arrays stage 2 (clustering + metrics) consumes.
Sharded (--dp) artifacts are served too: the host builds a mesh of
meta["n_devices"] devices, shards image/Z rows over its dp axis and
replicates params (build_mesh below); everything else is identical.
"""

import argparse
import pickle
import sys
import time

import numpy as np


def load_programs(path):
    from jax import export as jexport

    blob = pickle.load(open(path, "rb"))
    return (jexport.deserialize(blob["embed"]).call,
            jexport.deserialize(blob["alpha_x"]).call, blob["meta"])


def build_mesh(meta):
    """Mesh + placement shardings for a sharded (--dp) artifact: the
    serving host must run it under a mesh of the same device count, with
    batch/Z rows sharded over the dp axis and params/counts replicated
    (tpu_ac/utils/export.py export_sharded_category_programs)."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = meta["n_devices"]
    if len(jax.devices()) < n_dev:
        raise SystemExit(
            f"sharded artifact needs {n_dev} devices; this host has "
            f"{len(jax.devices())} (for a CPU dry run set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_dev})")
    mesh = Mesh(np_.asarray(jax.devices()[:n_dev]), (meta["mesh_axis"],))
    return (NamedSharding(mesh, P()),
            NamedSharding(mesh, P(meta["mesh_axis"])))


def embed_all(embed, params, images, batch_size, row_sharding=None):
    """Embed [N,3,H,W] uint8 in the artifact's fixed batch size (pad the
    tail batch; the programs are static-shape by design).  Returns a
    DEVICE array — the alpha program consumes it in place, so Z
    (~400 MB at the flagship shape) never round-trips to the host."""
    import jax
    import jax.numpy as jnp

    n = images.shape[0]
    out = []
    for i in range(0, n, batch_size):
        chunk = images[i:i + batch_size]
        if chunk.shape[0] < batch_size:
            pad = np.zeros((batch_size - chunk.shape[0], *chunk.shape[1:]),
                           chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        if row_sharding is not None:
            chunk = jax.device_put(chunk, row_sharding)
        out.append(embed(params, chunk))
    return jnp.concatenate(out)[:n]


def embed_to_capacity(embed, meta, params, images, capacity,
                      row_sharding=None):
    """Embed a [N,3,H,W] uint8 image set and zero-pad the rows to the
    artifact ``capacity`` (device array; sharded for --dp artifacts)."""
    import jax
    import jax.numpy as jnp

    z = embed_all(embed, params, images, meta["batch_size"], row_sharding)
    z_pad = jnp.pad(z, ((0, capacity - images.shape[0]), (0, 0), (0, 0)))
    if row_sharding is not None:
        z_pad = jax.device_put(z_pad, row_sharding)
    return z_pad


def serve_category(embed, alpha_x, meta, params, images, row_sharding=None,
                   zt_pad=None, n_train=None):
    """``params`` must already be device-resident (see main: one
    jax.device_put at startup — NOT per call; the flagship params are
    ~344 MB and re-uploading them would dominate serving latency).

    Supervised artifacts weight patches by distance to a TRAIN (nominal)
    bank instead of the other test images — pass ``zt_pad``/``n_train``
    (the train split embedded ONCE via :func:`embed_to_capacity`; the
    bank is fixed, so re-embedding it per category would double every
    call's cost.  Reference semantics per
    Anomaly-Clustering/models/patchcore/utils.py:230-277)."""
    n = images.shape[0]
    cap = meta["n_images_capacity"]
    if n > cap:
        raise SystemExit(f"category size {n} exceeds artifact capacity "
                         f"{cap}; re-export with a larger --n_images")
    supervised = meta["supervised"] == "supervised"
    if supervised and zt_pad is None:
        raise SystemExit("supervised artifact: pass the embedded train "
                         "bank (zt_pad/n_train — see embed_to_capacity)")

    z_pad = embed_to_capacity(embed, meta, params, images, cap, row_sharding)
    if supervised:
        # both layouts take (z, z_train, n_valid, n_train_valid); the
        # sharded program reshards the bank to replicated internally
        packed = np.asarray(alpha_x(z_pad, zt_pad, np.int32(n),
                                    np.int32(n_train)))[:n]
    elif meta.get("sharded"):
        # sharded alpha signature is (z_rows_sharded, n_valid) with Z rows
        # over the dp axis (the program all_gathers the bank over ICI)
        packed = np.asarray(alpha_x(z_pad, np.int32(n)))[:n]
    else:
        packed = np.asarray(alpha_x(z_pad, None, np.int32(n), None))[:n]
    p = meta["n_patches"]  # packed rows are [alpha (P patch weights), X (D)]
    return packed[:, :p], packed[:, p:]


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="serve a tpu_ac .tpuac artifact without tpu_ac")
    ap.add_argument("artifact")
    ap.add_argument("--params", required=True,
                    help=".npy (allow_pickle) dict of backbone params")
    ap.add_argument("--images", default=None,
                    help=".npy [N,3,H,W] uint8 category images")
    ap.add_argument("--train_images", default=None,
                    help=".npy [N,3,H,W] uint8 nominal/train split "
                        "(required for supervised artifacts)")
    ap.add_argument("--out", default=None,
                    help="write alpha/X to this .npz")
    ap.add_argument("--bench", action="store_true",
                    help="time the artifact on synthetic images")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); needed because "
                        "an ambient sitecustomize may claim an accelerator "
                        "before env vars are read")
    a = ap.parse_args(argv)

    assert not any(m.startswith("tpu_ac") for m in sys.modules)
    import jax

    if a.platform:
        jax.config.update("jax_platforms", a.platform)

    embed, alpha_x, meta = load_programs(a.artifact)
    row_sharding = None
    raw_params = np.load(a.params, allow_pickle=True).item()
    if meta.get("sharded"):
        repl, row_sharding = build_mesh(meta)
        params = jax.device_put(raw_params, repl)
    else:
        params = jax.device_put(raw_params)
    print(f"artifact: platforms={meta['platforms']} "
          f"batch={meta['batch_size']} capacity={meta['n_images_capacity']} "
          f"mode={meta['supervised']} tau={meta['tau']} "
          f"devices={meta.get('n_devices', 1)}", flush=True)

    train_images = None
    if a.train_images:
        train_images = np.load(a.train_images)
    elif meta["supervised"] == "supervised":
        if a.images:
            # real images + a made-up train bank would produce garbage
            # alpha/X with exit code 0 — refuse instead
            raise SystemExit("supervised artifact: --train_images is "
                             "required when serving real --images (the "
                             "synthetic train bank is only for "
                             "--bench/synthetic runs)")
        rng = np.random.default_rng(1)
        train_images = rng.integers(
            0, 255, (meta["batch_size"], 3, meta["imagesize"],
                     meta["imagesize"]), dtype=np.uint8)
        print(f"(no --train_images: using {train_images.shape[0]} "
              "synthetic train images)", flush=True)
    if a.images:
        images = np.load(a.images)
    else:
        rng = np.random.default_rng(0)
        images = rng.integers(
            0, 255, (meta["n_images_capacity"], 3, meta["imagesize"],
                     meta["imagesize"]), dtype=np.uint8)
        print(f"(no --images: using {images.shape[0]} synthetic images)",
              flush=True)

    # the train bank is fixed across categories: embed it ONCE at startup
    # (like the single params device_put), not per serve_category call
    zt_pad, n_train = None, None
    if train_images is not None:
        t_cap = meta.get("n_train_capacity", meta["n_images_capacity"])
        if train_images.shape[0] > t_cap:
            raise SystemExit(f"train split {train_images.shape[0]} exceeds "
                             f"artifact train capacity {t_cap}; re-export "
                             f"with a larger --n_train_images")
        zt_pad = embed_to_capacity(embed, meta, params, train_images,
                                   t_cap, row_sharding)
        n_train = train_images.shape[0]

    t0 = time.perf_counter()
    alpha, x = serve_category(embed, alpha_x, meta, params, images,
                              row_sharding, zt_pad, n_train)
    t1 = time.perf_counter()
    print(f"category served: alpha {alpha.shape} X {x.shape} "
          f"in {t1 - t0:.2f}s (first call includes compile)", flush=True)

    if a.bench:
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            serve_category(embed, alpha_x, meta, params, images,
                           row_sharding, zt_pad, n_train)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"serving throughput: {images.shape[0] / med:.1f} images/sec "
              f"(median of 5, N={images.shape[0]})", flush=True)

    if a.out:
        np.savez(a.out, alpha=alpha, X=x)
        print("wrote", a.out)


if __name__ == "__main__":
    main()
