"""k-NN evaluation CLI — dino-main/eval_knn.py rebuilt.

Extracts CLS features of train/val ImageFolder splits with a (DINO)
backbone and reports weighted k-NN top-1/top-5 for each k.
"""

from __future__ import annotations

import argparse

import numpy as np

from tpu_ac.data.imagefolder import ImageFolder
from tpu_ac.data.mvtec import load_image
from tpu_ac.data.prefetch import parallel_decode
from tpu_ac.models.registry import load_backbone
from tpu_ac.train.evals import extract_features, knn_classifier


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("k-NN evaluation (TPU-native)")
    p.add_argument("--arch", default="dino_deitsmall16",
                   help="backbone registry name")
    p.add_argument("--data_path", required=True,
                   help="ImageFolder root with train/ and val/")
    p.add_argument("--nb_knn", nargs="+", type=int, default=[10, 20, 100, 200])
    p.add_argument("--temperature", type=float, default=0.07)
    p.add_argument("--batch_size_per_gpu", type=int, default=128)
    p.add_argument("--imagesize", type=int, default=224)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--dump_features", default=None)
    p.add_argument("--dp", type=int, default=0,
                   help="Shard feature extraction over a DP-device mesh "
                        "(the reference's cross-rank extract+all_gather, "
                        "eval_knn.py:118-139, on ICI). 0 = single device.")
    return p


def _load_split(root: str, imagesize: int):
    ds = ImageFolder(root)
    imgs = parallel_decode(
        [path for path, _ in ds.samples],
        lambda p: load_image(p, resize=int(imagesize * 256 / 224),
                             imagesize=imagesize))
    labels = np.asarray([t for _, t in ds.samples])
    return imgs, labels, len(ds.class_to_idx)


def main(argv=None) -> None:
    import os

    import jax

    args = build_parser().parse_args(argv)
    params, cfg, family = load_backbone(args.arch,
                                        checkpoint_dir=args.checkpoint_dir)
    if family == "vit":
        from tpu_ac.models.vit import vit_cls_forward

        def raw_embed(p, x):
            return vit_cls_forward(p, x, cfg,
                                   precision=jax.lax.Precision.DEFAULT)
    else:
        from tpu_ac.models.resnet import resnet_forward

        def raw_embed(p, x):
            f = resnet_forward(p, x, cfg, taps=("layer4",))["layer4"]
            return f.mean(axis=(2, 3))

    # the reference's distributed extraction: every rank embeds its
    # subset, all_gather assembles the rank-0 feature matrix
    # (dino-main/eval_knn.py:118-139).  extract_features(mesh=...) is the
    # TPU-native form: GSPMD partitions the same embed over the dp mesh
    # (params replicated as a jit ARGUMENT — never closed over: remote
    # compiles reject inlined weights) and the replicated output lowers to
    # one all_gather on ICI.
    mesh = None
    if args.dp:
        from tpu_ac.distributed import dp_mesh, replicate

        mesh = dp_mesh(args.dp, args.batch_size_per_gpu)
        device_params = replicate(mesh, dict(params))
    else:
        device_params = jax.device_put(dict(params))
    train_x, train_y, n_cls = _load_split(
        os.path.join(args.data_path, "train"), args.imagesize)
    val_x, val_y, _ = _load_split(
        os.path.join(args.data_path, "val"), args.imagesize)
    train_f = extract_features(raw_embed, train_x, args.batch_size_per_gpu,
                               mesh=mesh, params=device_params)
    val_f = extract_features(raw_embed, val_x, args.batch_size_per_gpu,
                             mesh=mesh, params=device_params)
    if args.dump_features:
        np.savez(args.dump_features, train=train_f, val=val_f,
                 train_labels=train_y, val_labels=val_y)
    for k in args.nb_knn:
        top1, top5 = knn_classifier(train_f, train_y, val_f, val_y,
                                    k=min(k, len(train_y)),
                                    T=args.temperature, num_classes=n_cls)
        print(f"{k}-NN classifier result: Top1: {top1:.2f}, Top5: {top5:.2f}")


if __name__ == "__main__":
    main()
