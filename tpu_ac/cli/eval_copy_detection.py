"""Copy-detection CLI — dino-main/eval_copy_detection.py rebuilt.

Runs the Copydays protocol: query blocks (original/strong/jpegqual/crops)
against the original database, optional distractor merging and whitening
learned on a held-out image directory, CLS+GeM(4) features, cosine top-20,
per-block mAP.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpu_ac.models.registry import load_backbone
from tpu_ac.train.copy_detection import (
    CopydaysDataset,
    copydays_eval,
    extract_copydetect_features,
    is_image_file,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Copy detection on Copydays (TPU-native)")
    p.add_argument("--data_path", required=True,
                   help="Copydays root (original/strong/jpegqual/crops)")
    p.add_argument("--whitening_path", default="",
                   help="Directory of images for the whitening operator "
                        "(eval_copy_detection.py:210-213).")
    p.add_argument("--distractors_path", default="",
                   help="Directory of distractor images merged into the "
                        "database (eval_copy_detection.py:214-215).")
    p.add_argument("--imsize", default=320, type=int)
    p.add_argument("--batch_size_per_gpu", default=16, type=int)
    p.add_argument("--arch", default="dino_vitbase8",
                   help="backbone registry name")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--dp", action="store_true",
                   help="shard every extraction batch over all local "
                        "devices (the reference's DistributedSampler + "
                        "cross-rank all_gather, eval_copy_detection.py:"
                        "162,186-194). batch_size_per_gpu is rounded up "
                        "to a device-count multiple.")
    return p


def _load_dir_images(path: str, imsize: int) -> np.ndarray:
    names = [os.path.join(path, s) for s in sorted(os.listdir(path))
             if is_image_file(s)]
    return _load_paths(names, imsize)


def _load_paths(paths: list[str], imsize: int) -> np.ndarray:
    # reference transform: Resize((imsize, imsize)) + normalize — a SQUARE
    # resize with no crop (eval_copy_detection.py:154-158); shorter-edge
    # resize + center crop would discard content on non-square Copydays
    # images and change the protocol.  Decodes on a thread pool (the
    # reference's DataLoader num_workers role; PIL releases the GIL).
    from PIL import Image

    from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD
    from tpu_ac.data.prefetch import parallel_decode

    def one(p):
        img = Image.open(p).convert("RGB").resize((imsize, imsize),
                                                  Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
        return arr.transpose(2, 0, 1)

    return parallel_decode(paths, one).astype(np.float32)


def main(argv=None) -> None:
    import jax

    args = build_parser().parse_args(argv)
    params, cfg, family = load_backbone(args.arch,
                                        checkpoint_dir=args.checkpoint_dir)
    if family != "vit":
        raise SystemExit(f"Architecture {args.arch} non supported")
    from tpu_ac.models.vit import vit_intermediate_layers

    def tokens(p, x):
        return vit_intermediate_layers(p, x, cfg, n=1,
                                       precision=jax.lax.Precision.DEFAULT)[0]

    mesh = None
    batch = args.batch_size_per_gpu
    if args.dp:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        n_dev = mesh.devices.size
        batch = ((batch + n_dev - 1) // n_dev) * n_dev
        device_params = jax.device_put(dict(params),
                                       NamedSharding(mesh, P()))
    else:
        device_params = jax.device_put(dict(params))
    # tokens+GeM jitted inside extract_copydetect_features with the
    # (already device-resident) weights as a jit argument
    extract = lambda imgs: extract_copydetect_features(  # noqa: E731
        tokens, imgs, batch, mesh=mesh, params=device_params)

    dataset = CopydaysDataset(args.data_path)
    qpaths, block_sizes = dataset.query_paths()
    queries = extract(_load_paths(qpaths, args.imsize))
    print(f"Extraction of queries features done. Shape: {queries.shape}")
    database = extract(_load_paths(dataset.database_paths(), args.imsize))

    distractors = None
    if args.distractors_path and os.path.isdir(args.distractors_path):
        print("Using distractors...")
        distractors = extract(
            _load_dir_images(args.distractors_path, args.imsize))
    whitening = None
    if args.whitening_path and os.path.isdir(args.whitening_path):
        print(f"Extracting features on images from {args.whitening_path} "
              "for learning the whitening operator.")
        whitening = extract(
            _load_dir_images(args.whitening_path, args.imsize))

    results = copydays_eval(queries, database, dataset, block_sizes,
                            distractor_features=distractors,
                            whitening_features=whitening)
    for block, m_ap in results.items():
        print(f"eval on {block} mAP={m_ap:.3f}")
    return results


if __name__ == "__main__":
    main()
