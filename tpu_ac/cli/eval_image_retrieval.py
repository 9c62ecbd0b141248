"""Image retrieval on revisited Oxford/Paris — dino-main/eval_image_retrieval.py
rebuilt TPU-native.

Protocol (eval_image_retrieval.py:33-201): load the gnd pickle, embed the
database ("train") and query splits with the backbone's CLS feature
(aspect-preserving thumbnail resize, optionally multiscale), L2-normalize,
rank by cosine similarity, and report Medium/Hard mAP and mP@k.

    python -m tpu_ac.cli.eval_image_retrieval --data_path /data/revisited \
        --dataset roxford5k --arch dino_vitbase16 [--multiscale 1]
"""

from __future__ import annotations

import argparse

import numpy as np

from tpu_ac.data.oxford_paris import OxfordParisDataset
from tpu_ac.models.registry import load_backbone
from tpu_ac.train.evals import multi_scale, revisited_retrieval_eval


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "Image Retrieval on revisited Paris and Oxford (TPU-native)")
    p.add_argument("--data_path", required=True,
                   help="root containing <dataset>/gnd_<dataset>.pkl + jpg/")
    p.add_argument("--dataset", default="roxford5k",
                   choices=["roxford5k", "rparis6k"])
    p.add_argument("--multiscale", default=0, type=int,
                   help="1 = ensemble features over scales 1, 1/sqrt(2), 1/2")
    p.add_argument("--imsize", default=224, type=int,
                   help="thumbnail bound (aspect-preserving)")
    p.add_argument("--arch", default="dino_vitbase16",
                   help="backbone registry name")
    p.add_argument("--checkpoint_dir", default=None)
    return p


def extract_split_features(embed_fn, dataset: OxfordParisDataset,
                           multiscale: bool = False) -> np.ndarray:
    """Per-image CLS features (images vary in shape after thumbnail, so
    the jitted embed runs once per distinct shape — the reference likewise
    iterates with batch_size=1, eval_image_retrieval.py:118-127)."""
    import jax.numpy as jnp

    feats = []
    for i in range(len(dataset)):
        x = dataset[i][None]  # [1, 3, H, W]
        x = jnp.asarray(x)
        if multiscale:
            f = multi_scale(x, embed_fn)
        else:
            f = embed_fn(x)
        feats.append(np.asarray(f)[0])
    return np.stack(feats)


def main(argv=None) -> dict:
    import jax

    args = build_parser().parse_args(argv)
    params, cfg, family = load_backbone(args.arch,
                                        checkpoint_dir=args.checkpoint_dir)
    if family != "vit":
        raise SystemExit(f"Architecture {args.arch} non supported")
    from tpu_ac.models.vit import vit_cls_forward

    @jax.jit
    def cls(p, x):
        return vit_cls_forward(p, x, cfg,
                               precision=jax.lax.Precision.DEFAULT)

    device_params = jax.device_put(dict(params))

    def embed(x):
        # ViT patch grid needs H, W divisible by patch_size; the stride-ps
        # conv in the reference silently floors — cropping the remainder is
        # numerically identical
        h = (x.shape[2] // cfg.patch_size) * cfg.patch_size
        w = (x.shape[3] // cfg.patch_size) * cfg.patch_size
        return cls(device_params, x[:, :, :h, :w])

    ds_train = OxfordParisDataset(args.data_path, args.dataset, "train",
                                  imsize=args.imsize)
    ds_query = OxfordParisDataset(args.data_path, args.dataset, "query",
                                  imsize=args.imsize)
    print(f"train: {len(ds_train)} imgs / query: {len(ds_query)} imgs")

    train_features = extract_split_features(embed, ds_train,
                                            bool(args.multiscale))
    query_features = extract_split_features(embed, ds_query,
                                            bool(args.multiscale))

    ks = [1, 5, 10]
    res = revisited_retrieval_eval(query_features, train_features,
                                   ds_train.cfg["gnd"], kappas=ks)
    print(">> {}: mAP M: {}, H: {}".format(
        args.dataset, np.around(res["mAP_M"] * 100, decimals=2),
        np.around(res["mAP_H"] * 100, decimals=2)))
    print(">> {}: mP@k{} M: {}, H: {}".format(
        args.dataset, np.array(ks),
        np.around(res["mP@k_M"] * 100, decimals=2),
        np.around(res["mP@k_H"] * 100, decimals=2)))
    return res


if __name__ == "__main__":
    main()
