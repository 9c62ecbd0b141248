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
import functools

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
    p.add_argument("--dp", action="store_true",
                   help="shape-bucketed data-parallel extraction over all "
                        "local devices (the reference's DistributedSampler "
                        "sharding, eval_image_retrieval.py:112-118).")
    return p


@functools.lru_cache(maxsize=16)
def _multiscale_fused(embed_fn, multiscale: bool):
    """Stable (per embed_fn) multiscale wrapper so the train and query
    splits share one `_jitted_extractor` entry — same composition as
    copy_detection's `_gem_fused`."""
    if not multiscale:
        return embed_fn

    def fused(p, x):
        return multi_scale(x, lambda xx: embed_fn(p, xx))

    return fused


def _bucketed_extractor(embed_fn, mesh, multiscale: bool):
    """One dp-sharded jit per (embed_fn, mesh, multiscale): replicated
    params, dp-sharded batch, replicated output (train/evals.py's shared
    wrapper — one copy of the dp-jit pattern across the eval CLIs)."""
    from tpu_ac.train.evals import _jitted_extractor

    return _jitted_extractor(_multiscale_fused(embed_fn, multiscale), mesh)


def extract_split_features(embed_fn, dataset: OxfordParisDataset,
                           multiscale: bool = False, *, mesh=None,
                           params=None) -> np.ndarray:
    """Per-image CLS features (images vary in shape after thumbnail, so
    the jitted embed runs once per distinct shape — the reference likewise
    iterates with batch_size=1, eval_image_retrieval.py:118-127).

    With ``mesh`` (and ``params``; ``embed_fn(params, batch)``) extraction
    is SHAPE-BUCKETED data parallel — the TPU-native answer to the
    reference's DistributedSampler sharding (eval_image_retrieval.py:
    112-118): images are grouped by post-thumbnail shape into bounded
    streaming buffers, each full buffer (8 x device count) is embedded as
    one dp-sharded batch and the ragged tail pads to a device-count
    multiple, and features scatter back into dataset order.  Same
    numerics as the per-image path (the ViT is per-image; only batching
    changes); at most two programs per distinct shape (the full-buffer
    size and its tail).  Host memory is bounded by the live buffers, not
    the split size (a revisited-Oxford split is tens of GB of f32
    thumbnails).
    """
    import jax
    import jax.numpy as jnp

    if mesh is not None:
        if params is None:
            raise ValueError("extract_split_features(mesh=...) requires "
                             "params= (weights travel as a jit argument)")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from concurrent.futures import ThreadPoolExecutor

        from tpu_ac.data.prefetch import _lookahead

        rep = NamedSharding(mesh, P())
        jitted = _bucketed_extractor(embed_fn, mesh, multiscale)
        device_params = jax.device_put(params, rep)
        n_dev = mesh.devices.size
        cap = 8 * n_dev

        out: list[np.ndarray | None] = [None] * len(dataset)
        buffers: dict[tuple, list[tuple[int, np.ndarray]]] = {}

        def flush(shape):
            idxs = [i for i, _ in buffers[shape]]
            x = np.stack([im for _, im in buffers.pop(shape)])
            pad = (-len(idxs)) % n_dev
            if pad:
                x = np.concatenate([x, np.zeros((pad, *shape), x.dtype)])
            f = np.asarray(jitted(device_params, jnp.asarray(x)))
            for k, i in enumerate(idxs):
                out[i] = f[k]

        # decode/thumbnail one cap-sized chunk ahead on a thread pool (PIL
        # releases the GIL) while the current chunk's buffers embed — the
        # dp speedup would otherwise be re-bottlenecked on serial decode
        with ThreadPoolExecutor(8, "tpu_ac-decode") as pool, \
                ThreadPoolExecutor(1, "tpu_ac-prefetch") as head:
            def chunks():
                for s in range(0, len(dataset), cap):
                    idxs = range(s, min(s + cap, len(dataset)))
                    yield lambda idxs=idxs: list(
                        pool.map(lambda i: (i, dataset[i]), idxs))

            for chunk in _lookahead(head, chunks()):
                for i, im in chunk:
                    buffers.setdefault(im.shape, []).append((i, im))
                    if len(buffers[im.shape]) >= cap:
                        flush(im.shape)
        for shape in list(buffers):
            flush(shape)
        return np.stack(out)

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

    def cls(p, x):
        # ViT patch grid needs H, W divisible by patch_size; the stride-ps
        # conv in the reference silently floors — cropping the remainder is
        # numerically identical
        h = (x.shape[2] // cfg.patch_size) * cfg.patch_size
        w = (x.shape[3] // cfg.patch_size) * cfg.patch_size
        return vit_cls_forward(p, x[:, :, :h, :w], cfg,
                               precision=jax.lax.Precision.DEFAULT)

    mesh = None
    if args.dp:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("dp",))

    if mesh is None:
        device_params = jax.device_put(dict(params))
        cls_jit = jax.jit(cls)
        embed = lambda x: cls_jit(device_params, x)  # noqa: E731

    ds_train = OxfordParisDataset(args.data_path, args.dataset, "train",
                                  imsize=args.imsize)
    ds_query = OxfordParisDataset(args.data_path, args.dataset, "query",
                                  imsize=args.imsize)
    print(f"train: {len(ds_train)} imgs / query: {len(ds_query)} imgs")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep_params = jax.device_put(dict(params), NamedSharding(mesh, P()))
        train_features = extract_split_features(
            cls, ds_train, bool(args.multiscale), mesh=mesh,
            params=rep_params)
        query_features = extract_split_features(
            cls, ds_query, bool(args.multiscale), mesh=mesh,
            params=rep_params)
    else:
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
