"""Ahead-of-time export of the serving programs (jax.export / StableHLO).

The reference has no AOT serving story — every deployment imports the
model code and re-traces Python (examples/main.py builds the backbone +
hooks per run).  Here the two programs a serving host needs — batched
embedding and the fused alpha+X — serialize to StableHLO artifacts
(`jax.export`) that any JAX process can load and call WITHOUT tpu_ac's
model code, with the same static-shape bucketing the pipeline uses
(n_images pads to the embed batch / alpha bucket, so one artifact serves
every category size up to its capacity).

Params stay ARGUMENTS of the exported functions (never captured
constants — a captured ViT-B inlines ~344 MB of HLO literals); ship them
alongside via ``tpu_ac.utils.checkpoint`` or the converted state_dict.

Typical flow::

    emb = build_embedder_for_config(cfg, mesh=None)
    blob = export_category_programs(emb, cfg, n_images=32)
    save_exported("category_serving.tpuac", blob)
    # ... on the serving host (no model code needed):
    progs = load_exported("category_serving.tpuac")
    z = progs["embed"](params, images)            # [B, P, D]
    packed = progs["alpha_x"](z_padded, n_valid)  # [N_pad, P+D]
"""

from __future__ import annotations

import pickle
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

_FORMAT_VERSION = 1


def _spec_like(x) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(np.shape(x), x.dtype)


def export_category_programs(embedder, cfg, n_images: int, *,
                             n_train_images: int | None = None,
                             platforms: tuple[str, ...] | None = None
                             ) -> dict[str, Any]:
    """Serialize the embed + alpha+X programs for one serving shape.

    Args:
        embedder: a ``CategoryEmbedder`` (single-device; mesh shardings are
            per-topology and are not exported).
        cfg: the ``PipelineConfig`` (supplies batch_size, tau, mode,
            precision — all baked into the artifact like the reference
            bakes them into its output-dir name).
        n_images: alpha capacity; category sizes <= n_images are served by
            padding to it (the same one-program-per-bucket scheme
            ``compute_alpha_X`` uses).
        n_train_images: supervised-mode train-bank capacity, bucketed
            independently of the test capacity (a realistic MVTec train
            split is ~200+ nominal images while categories are <=32-170;
            coupling the two would inflate the O(cap^2) alpha work).
            Default: ``n_images``.
        platforms: lowering platforms, e.g. ("tpu",) or ("cpu", "tpu").
            None = the current default backend.  NOTE: the alpha path
            picks its implementation at TRACE time
            (cluster/alpha._use_pallas): exporting from a CPU host bakes
            the XLA formulation (numerically identical on TPU, slower
            than the Pallas kernel); export from a TPU-backed process to
            bake the fused kernel.

    Returns a picklable dict (pass to ``save_exported``).
    """
    from jax import export as jexport

    from tpu_ac.pipeline import _alpha_x_program

    if embedder.mesh is not None:
        raise ValueError("export serializes single-device programs; "
                         "build the embedder with mesh=None")
    if cfg.supervised not in ("unsupervised", "supervised"):
        # "average" runs eager and unpadded in compute_alpha_X — there is
        # no bucketed program to serialize for it
        raise ValueError(f"mode {cfg.supervised!r} is not exportable; "
                         "use unsupervised or supervised")
    kwargs = {"platforms": list(platforms)} if platforms else {}

    params_spec = jax.tree.map(_spec_like, dict(embedder._device_params))
    bs = cfg.batch_size
    img_spec = jax.ShapeDtypeStruct(
        (bs, 3, cfg.imagesize, cfg.imagesize), np.uint8)
    embed_exp = jexport.export(embedder._embed_fn, **kwargs)(
        params_spec, img_spec)

    # alpha+X on the n_images-padded bucket: Z/n_valid stay arguments so
    # one artifact serves any category size up to n_images
    p = embed_exp.out_avals[0].shape[1]
    d = embed_exp.out_avals[0].shape[2]
    n_pad = -(-n_images // 32) * 32  # same 32-bucket compute_alpha_X uses
    nt_pad = -(-(n_train_images or n_images) // 32) * 32
    z_spec = jax.ShapeDtypeStruct((n_pad, p, d), np.float32)
    zt_spec = jax.ShapeDtypeStruct((nt_pad, p, d), np.float32)
    n_spec = jax.ShapeDtypeStruct((), np.int32)
    if cfg.supervised == "supervised":
        alpha_exp = jexport.export(_alpha_x_program, **kwargs)(
            z_spec, zt_spec, n_spec, n_spec, supervised="supervised",
            tau=float(cfg.tau), precision=cfg.resolved_alpha_precision,
            packed=True)
    else:
        alpha_exp = jexport.export(_alpha_x_program, **kwargs)(
            z_spec, None, n_spec, None, supervised="unsupervised",
            tau=float(cfg.tau), precision=cfg.resolved_alpha_precision,
            packed=True)

    return {
        "format_version": _FORMAT_VERSION,
        "embed": embed_exp.serialize(),
        "alpha_x": alpha_exp.serialize(),
        "meta": {
            "backbone_name": cfg.backbone_name,
            "layers": list(cfg.layers),
            "batch_size": bs,
            "imagesize": cfg.imagesize,
            "n_images_capacity": int(n_pad),
            "n_train_capacity": int(nt_pad),
            "supervised": cfg.supervised,
            "tau": float(cfg.tau),
            "precision": cfg.precision,
            "alpha_precision": cfg.resolved_alpha_precision,
            "platforms": list(embed_exp.platforms),
            "image_dtype": "uint8",  # _prep branches on dtype at trace time
            "n_patches": int(p),
            "embed_dim": int(d),
        },
    }


def _make_sharded_alpha_x(mesh, supervised: str, tau: float,
                          precision: str):
    """Jittable packed alpha+X over a dp-sharded image set.

    The weight computation runs as a shard_map (each device's rows against
    one tiled all_gather of the bank over ICI, exactly the
    ``compute_alpha_X`` mesh path); n_valid / n_train_valid stay TRACED
    arguments so one exported program serves every category size up to the
    padded capacity.
    """
    import functools

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_ac.cluster.alpha import alpha_from_weights, weighted_embedding
    from tpu_ac.distributed.mesh import _per_image_weights

    if supervised == "supervised":
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P("dp"), P(), P()), out_specs=P("dp"),
                           check_rep=False)
        def _wdist(z_local, bank, nv):
            return _per_image_weights(z_local, bank, "min", nv, precision)

        def fn(z_sh, z_train, n_valid, n_train_valid):
            w = _wdist(z_sh, z_train, n_train_valid)
            alpha = alpha_from_weights(w, tau)
            x = weighted_embedding(alpha, z_sh)
            return jnp.concatenate([alpha, x], axis=1)
    else:
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P("dp"), P()), out_specs=P("dp"),
                           check_rep=False)
        def _wdist(z_local, nv):
            from tpu_ac.distributed.mesh import triangle_weights_local

            if mesh.shape["dp"] == 1:  # triangle needs >= 2 shards
                bank = jax.lax.all_gather(z_local, "dp", axis=0, tiled=True)
                return _per_image_weights(z_local, bank, "mean", nv,
                                          precision)
            # triangle-aware sweep (half the rectangular MXU work; one
            # [N, P] psum) — n_valid stays TRACED so one artifact serves
            # every category size
            return triangle_weights_local(z_local, "dp", nv, precision)

        def fn(z_sh, n_valid):
            w = _wdist(z_sh, n_valid)
            alpha = alpha_from_weights(w, tau)
            x = weighted_embedding(alpha, z_sh)
            return jnp.concatenate([alpha, x], axis=1)
    return fn


def export_sharded_category_programs(embedder, cfg, n_images: int, *,
                                     n_train_images: int | None = None,
                                     platforms: tuple[str, ...] | None = None
                                     ) -> dict[str, Any]:
    """Multi-chip variant of :func:`export_category_programs`.

    Serializes the dp-sharded embed (params replicated, image batch sharded
    over the mesh's "dp" axis) and the shard_map'd alpha+X (each device's
    rows against a tiled all_gather of the bank). The artifact records the
    device count; the serving host must call it under a mesh of the SAME
    size, with inputs placed via ``NamedSharding(mesh, P("dp"))`` (params
    and the traced valid counts replicated, ``P()``).

    The reference has no multi-GPU serving story at all (its alpha is a
    single-process torch loop); this is a TPU-native extension.
    """
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    if embedder.mesh is None:
        raise ValueError("sharded export needs a mesh-built embedder; "
                         "use export_category_programs for single-device")
    if cfg.supervised not in ("unsupervised", "supervised"):
        raise ValueError(f"mode {cfg.supervised!r} is not exportable; "
                         "use unsupervised or supervised")
    mesh = embedder.mesh
    dp = mesh.shape["dp"]
    bs = cfg.batch_size
    if bs % dp:
        raise ValueError(f"batch_size {bs} must divide over dp={dp}")
    kwargs = {"platforms": list(platforms)} if platforms else {}

    repl = NamedSharding(mesh, P())
    row_sh = NamedSharding(mesh, P("dp"))
    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=repl),
        dict(embedder._device_params))
    img_spec = jax.ShapeDtypeStruct(
        (bs, 3, cfg.imagesize, cfg.imagesize), np.uint8, sharding=row_sh)
    embed_exp = jexport.export(embedder._embed_fn, **kwargs)(
        params_spec, img_spec)

    p = embed_exp.out_avals[0].shape[1]
    d = embed_exp.out_avals[0].shape[2]
    # pad the alpha capacity to the 32-bucket AND the dp axis
    bucket = np.lcm(32, dp)
    n_pad = int(-(-n_images // bucket) * bucket)
    nt_pad = int(-(-(n_train_images or n_images) // bucket) * bucket)
    z_spec = jax.ShapeDtypeStruct((n_pad, p, d), np.float32, sharding=row_sh)
    zt_spec = jax.ShapeDtypeStruct((nt_pad, p, d), np.float32,
                                   sharding=row_sh)
    n_spec = jax.ShapeDtypeStruct((), np.int32, sharding=repl)
    fn = jax.jit(_make_sharded_alpha_x(
        mesh, cfg.supervised, float(cfg.tau), cfg.resolved_alpha_precision))
    if cfg.supervised == "supervised":
        alpha_exp = jexport.export(fn, **kwargs)(
            z_spec, zt_spec, n_spec, n_spec)
    else:
        alpha_exp = jexport.export(fn, **kwargs)(z_spec, n_spec)

    return {
        "format_version": _FORMAT_VERSION,
        "embed": embed_exp.serialize(),
        "alpha_x": alpha_exp.serialize(),
        "meta": {
            "backbone_name": cfg.backbone_name,
            "layers": list(cfg.layers),
            "batch_size": bs,
            "imagesize": cfg.imagesize,
            "n_images_capacity": n_pad,
            "n_train_capacity": nt_pad,
            "supervised": cfg.supervised,
            "tau": float(cfg.tau),
            "precision": cfg.precision,
            "alpha_precision": cfg.resolved_alpha_precision,
            "platforms": list(embed_exp.platforms),
            "image_dtype": "uint8",
            "n_patches": int(p),
            "embed_dim": int(d),
            "sharded": True,
            "n_devices": int(dp),
            "mesh_axis": "dp",
        },
    }


def save_exported(path: str, blob: Mapping[str, Any]) -> str:
    with open(path, "wb") as f:
        pickle.dump(dict(blob), f)
    return path


def load_exported(path: str) -> dict[str, Any]:
    """Load an artifact: {"embed": fn, "alpha_x": fn, "meta": {...}}.

    The returned callables are the deserialized StableHLO programs —
    ``embed(params, uint8_images)`` and ``alpha_x(Z_padded[, Z_train],
    n_valid[, n_train_valid])`` (packed [N_pad, P+D] output) — runnable
    without tpu_ac's model code.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported export format {blob.get('format_version')!r}")
    alpha_call = jexport.deserialize(blob["alpha_x"]).call
    if (blob["meta"]["supervised"] != "supervised"
            and not blob["meta"].get("sharded")):
        # the single-device exported pytree carries None placeholders for
        # the absent train-bank arguments; hide them behind the 2-arg
        # signature (the sharded program is exported 2-arg already)
        raw = alpha_call
        alpha_call = lambda Z, n_valid: raw(Z, None, n_valid, None)  # noqa: E731
    return {
        "embed": jexport.deserialize(blob["embed"]).call,
        "alpha_x": alpha_call,
        "meta": blob["meta"],
    }
