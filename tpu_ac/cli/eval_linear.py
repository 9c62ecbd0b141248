"""Linear-probe evaluation CLI — dino-main/eval_linear.py rebuilt.

Trains an SGD linear classifier on frozen backbone features (final-norm'd
CLS of the last n blocks, optionally with avg-pooled patch tokens — the
reference's ``avgpool_patchtokens`` for ViT-Base, eval_linear.py:56-63)
and reports top-1 on the val split.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpu_ac.data.classification import num_shuffled_batches, shuffled_batches
from tpu_ac.data.imagefolder import ImageFolder
from tpu_ac.data.mvtec import load_image
from tpu_ac.models.registry import load_backbone
from tpu_ac.train.dino import cosine_scheduler
from tpu_ac.train.evals import extract_features, make_linear_probe


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Linear probe (TPU-native)")
    p.add_argument("--arch", default="dino_deitsmall16")
    p.add_argument("--n_last_blocks", type=int, default=4)
    p.add_argument("--avgpool_patchtokens", action="store_true")
    p.add_argument("--data_path", required=True)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--batch_size_per_gpu", type=int, default=256)
    p.add_argument("--imagesize", type=int, default=224)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--dp", type=int, default=0,
                   help="Shard feature extraction AND probe training over "
                        "a DP-device mesh (the reference DDP-wraps the "
                        "linear classifier, eval_linear.py:62). "
                        "0 = single device.")
    return p


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    params, cfg, family = load_backbone(args.arch,
                                        checkpoint_dir=args.checkpoint_dir)
    assert family == "vit", "linear probe CLI currently drives ViT backbones"
    from tpu_ac.models.vit import vit_intermediate_layers

    n = args.n_last_blocks

    def raw_embed(p, x):
        outs = vit_intermediate_layers(p, x, cfg, n=n,
                                       precision=jax.lax.Precision.DEFAULT)
        feats = jnp.concatenate([o[:, 0] for o in outs], axis=-1)
        if args.avgpool_patchtokens:
            feats = jnp.concatenate(
                [feats, jnp.mean(outs[-1][:, 1:], axis=1)], axis=-1)
        return feats

    mesh = None
    if args.dp:
        from tpu_ac.distributed import dp_mesh, replicate

        mesh = dp_mesh(args.dp, args.batch_size_per_gpu)
        device_params = replicate(mesh, dict(params))
    else:
        device_params = jax.device_put(dict(params))

    def load_split(split):
        from tpu_ac.data.prefetch import parallel_decode

        ds = ImageFolder(os.path.join(args.data_path, split))
        imgs = parallel_decode(
            [path for path, _ in ds.samples],
            lambda p: load_image(p, resize=int(args.imagesize * 256 / 224),
                                 imagesize=args.imagesize))
        return (extract_features(raw_embed, imgs, args.batch_size_per_gpu,
                                 normalize=False, mesh=mesh,
                                 params=device_params),
                np.asarray([t for _, t in ds.samples]),
                len(ds.class_to_idx))

    train_f, train_y, n_cls = load_split("train")
    val_f, val_y, _ = load_split("val")

    state, step, predict = make_linear_probe(train_f.shape[1], n_cls,
                                             lr=args.lr, mesh=mesh)
    # one copy of the dp batch rules: shuffled_batches trims every batch
    # (incl. the smaller-than-batch fallback) to the dp multiple
    steps_per_epoch = num_shuffled_batches(len(train_f),
                                           args.batch_size_per_gpu,
                                           multiple_of=args.dp or 1)
    lr_table = cosine_scheduler(args.lr, 0.0,
                                args.epochs * steps_per_epoch)
    it = 0
    for epoch in range(args.epochs):
        for idx in shuffled_batches(len(train_f), args.batch_size_per_gpu,
                                    seed=epoch,
                                    multiple_of=args.dp or 1):
            state, loss = step(state, jnp.asarray(train_f[idx]),
                               jnp.asarray(train_y[idx]),
                               jnp.float32(lr_table[min(it,
                                                        len(lr_table) - 1)]))
            it += 1
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            preds = np.asarray(predict(state, jnp.asarray(val_f))).argmax(1)
            acc = 100.0 * np.mean(preds == val_y)
            print(f"epoch {epoch}: val top-1 {acc:.2f}% (loss {float(loss):.4f})")


if __name__ == "__main__":
    main()
