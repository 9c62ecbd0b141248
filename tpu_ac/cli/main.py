"""CLI stage 1: per-category alpha-matrix + weighted-embedding build.

Flag-compatible rebuild of Anomaly-Clustering/examples/main.py:314-366:
same flags, same output tree and pickle naming, but the device work runs
as batched jitted XLA programs instead of a batch_size=1 torch loop.
"""

from __future__ import annotations

import argparse
import logging
import time

from tpu_ac.data.mvtec import CLASSNAMES
from tpu_ac.utils.profiling import maybe_profile, step_annotation
from tpu_ac.pipeline import (
    PipelineConfig,
    build_embedder_for_config,
    run_category_sweep,
)

LOGGER = logging.getLogger("tpu_ac.cli.main")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Calculating Matrix on MVTec AD (TPU-native)")
    p.add_argument("--path", default="data/mvtec_ad", type=str,
                   help="Path to the dataset.")
    p.add_argument("--backbone_names", nargs="+", default=["dino_vitbase8"],
                   help="Architecture.")
    p.add_argument("--layers_to_extract_from", nargs="+",
                   default=["blocks.10", "blocks.11"])
    p.add_argument("--pretrain_embed_dimension", default=2048, type=int)
    p.add_argument("--target_embed_dimension", default=4096, type=int)
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--patchsize", type=int, default=3)
    p.add_argument("--tau", type=float, default=1)
    p.add_argument("--train_ratio", type=float, default=1)
    p.add_argument("--supervised", default="unsupervised", type=str,
                   help="unsupervised | supervised | average | all "
                        "(reference main.py loops un+supervised; "
                        "pass a single mode to run just that)")
    p.add_argument("--dataset", default="mvtec_ad", type=str)
    p.add_argument("--categories", nargs="+", default=None,
                   help="Subset of categories (default: all 15).")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--checkpoint_dir", default=None,
                   help="Directory holding converted backbone checkpoints.")
    p.add_argument("--profile", default=None, metavar="TRACE_DIR",
                   help="Capture a jax.profiler trace of the device work "
                        "into TRACE_DIR (exceeds the reference's "
                        "MetricLogger-only observability, "
                        "dino-main/utils.py:348-400).")
    p.add_argument("--precision", default="bfloat16",
                   choices=["default", "highest", "bfloat16"],
                   help="Embed compute precision. 'bfloat16' (default) runs "
                        "the backbone in bf16 — ~1.8x faster embed, and the "
                        "reference's own golden embeddings quantized to "
                        "bf16 reproduce its published CSV metrics to 1e-6 "
                        "(tests/test_golden_bf16.py; PARITY.md 'precision "
                        "defaults'). 'default' keeps f32 storage; 'highest' "
                        "is the strictest-parity escape hatch.")
    p.add_argument("--alpha_precision", default="auto",
                   choices=["auto", "f32", "bf16c", "bf16"],
                   help="Distance-kernel precision for the alpha weights "
                        "(auto follows --precision; bf16c = compensated "
                        "hi/lo-split bf16).")
    return p


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    print("\n".join("%s: %s" % (k, str(v))
                    for k, v in sorted(vars(args).items())))

    modes = (["unsupervised", "supervised"] if args.supervised == "all"
             else [args.supervised])
    categories = args.categories or CLASSNAMES

    # multi-backbone layer syntax "<idx>.<layer>" (examples/main.py:220-228):
    # like the reference, only backbone_names[0]'s layers are used.
    layers = args.layers_to_extract_from
    if len(args.backbone_names) > 1:
        coll = [[] for _ in args.backbone_names]
        for layer in layers:
            idx, rest = layer.split(".", 1)
            coll[int(idx)].append(rest)
        layers = coll[0]
        LOGGER.warning(
            "multiple backbones given; following the reference, only %s "
            "with layers %s is used", args.backbone_names[0], layers)
    args.layers_to_extract_from = layers

    for supervised in modes:
        cfg = PipelineConfig(
            backbone_name=args.backbone_names[0],
            layers=tuple(args.layers_to_extract_from),
            pretrain_embed_dimension=args.pretrain_embed_dimension,
            target_embed_dimension=args.target_embed_dimension,
            patchsize=args.patchsize,
            tau=args.tau,
            train_ratio=args.train_ratio,
            supervised=supervised,
            batch_size=args.batch_size,
            precision=args.precision,
            alpha_precision=args.alpha_precision,
        )
        embedder = build_embedder_for_config(
            cfg, checkpoint_dir=args.checkpoint_dir)
        with maybe_profile(args.profile):
            # run_category_sweep decodes category c+1 on host threads while
            # category c embeds on the device
            t0 = time.time()
            for category, result in run_category_sweep(
                    args.path, list(categories), cfg, embedder,
                    output_dir=args.output_dir, dataset_name=args.dataset):
                LOGGER.info("%s [%s]: %d images -> %s (%.1fs)",
                            category, supervised,
                            len(result["anomaly_labels"]),
                            result.get("artifact_path"), time.time() - t0)
                t0 = time.time()


if __name__ == "__main__":
    main()
