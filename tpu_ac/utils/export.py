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
import numpy as np

_FORMAT_VERSION = 1


def _spec_like(x) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(np.shape(x), x.dtype)


def export_category_programs(embedder, cfg, n_images: int, *,
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
    z_spec = jax.ShapeDtypeStruct((n_pad, p, d), np.float32)
    n_spec = jax.ShapeDtypeStruct((), np.int32)
    if cfg.supervised == "supervised":
        alpha_exp = jexport.export(_alpha_x_program, **kwargs)(
            z_spec, z_spec, n_spec, n_spec, supervised="supervised",
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
    if blob["meta"]["supervised"] != "supervised":
        # the exported pytree carries None placeholders for the absent
        # train-bank arguments; hide them behind the 2-arg signature
        raw = alpha_call
        alpha_call = lambda Z, n_valid: raw(Z, None, n_valid, None)  # noqa: E731
    return {
        "embed": jexport.deserialize(blob["embed"]).call,
        "alpha_x": alpha_call,
        "meta": blob["meta"],
    }
