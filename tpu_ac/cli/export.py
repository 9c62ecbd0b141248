"""AOT serving-export CLI: serialize the embed + alpha+X programs.

TPU-native addition (the reference re-traces Python per deployment; see
Anomaly-Clustering/examples/main.py:348-366).  Produces a StableHLO
artifact via ``tpu_ac.utils.export`` that a serving host loads with
``load_exported`` and calls without the model code.

Run this ON the target backend (a TPU-backed process) to bake the fused
Pallas alpha kernel; exporting from a CPU host bakes the numerically
identical XLA formulation.
"""

from __future__ import annotations

import argparse
import logging

from tpu_ac.pipeline import PipelineConfig, build_embedder_for_config
from tpu_ac.utils.export import export_category_programs, save_exported

LOGGER = logging.getLogger("tpu_ac.cli.export")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("AOT serving export (TPU-native)")
    p.add_argument("--backbone_name", default="dino_vitbase8")
    p.add_argument("--layers_to_extract_from", nargs="+",
                   default=["blocks.10", "blocks.11"])
    p.add_argument("--pretrain_embed_dimension", default=2048, type=int)
    p.add_argument("--target_embed_dimension", default=4096, type=int)
    p.add_argument("--patchsize", type=int, default=3)
    p.add_argument("--tau", type=float, default=1)
    p.add_argument("--supervised", default="unsupervised",
                   choices=["unsupervised", "supervised"])
    p.add_argument("--imagesize", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--precision", default="default",
                   choices=["default", "highest", "bfloat16"])
    p.add_argument("--n_images", type=int, default=32,
                   help="alpha capacity: category sizes up to this serve "
                        "from one artifact (padded to the 32-bucket)")
    p.add_argument("--n_train_images", type=int, default=None,
                   help="supervised-mode train-bank capacity (own bucket, "
                        "independent of --n_images; a real MVTec train "
                        "split is ~200+ images). Default: --n_images")
    p.add_argument("--dump_params", default=None,
                   help="also save the embedder's params as a .npy dict "
                        "here (the serving host's --params input)")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (e.g. tpu, or: cpu tpu); "
                        "default = the current backend")
    p.add_argument("--dp", type=int, default=None,
                   help="export the MULTI-CHIP programs sharded over a "
                        "dp-axis mesh of this many devices (the serving "
                        "host must run the artifact under a same-size "
                        "mesh); default = single-device programs")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--output", default="category_serving.tpuac")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)
    cfg = PipelineConfig(
        backbone_name=args.backbone_name,
        layers=tuple(args.layers_to_extract_from),
        pretrain_embed_dimension=args.pretrain_embed_dimension,
        target_embed_dimension=args.target_embed_dimension,
        patchsize=args.patchsize, tau=args.tau,
        supervised=args.supervised, imagesize=args.imagesize,
        batch_size=args.batch_size, precision=args.precision)
    platforms = tuple(args.platforms) if args.platforms else None
    if args.dp:
        from tpu_ac.distributed import get_mesh
        from tpu_ac.utils.export import export_sharded_category_programs

        embedder = build_embedder_for_config(
            cfg, checkpoint_dir=args.checkpoint_dir,
            mesh=get_mesh(args.dp))
        blob = export_sharded_category_programs(
            embedder, cfg, n_images=args.n_images,
            n_train_images=args.n_train_images, platforms=platforms)
    else:
        embedder = build_embedder_for_config(
            cfg, checkpoint_dir=args.checkpoint_dir, mesh=None)
        blob = export_category_programs(
            embedder, cfg, n_images=args.n_images,
            n_train_images=args.n_train_images, platforms=platforms)
    path = save_exported(args.output, blob)
    if args.dump_params:
        import numpy as np

        np.save(args.dump_params,
                {k: np.asarray(v) for k, v in embedder._device_params.items()},
                allow_pickle=True)
        LOGGER.info("wrote params to %s", args.dump_params)
    LOGGER.info("wrote %s (platforms=%s, capacity=%d)", path,
                blob["meta"]["platforms"], blob["meta"]["n_images_capacity"])
    print(path)
    return path


if __name__ == "__main__":
    main()
