"""SCAN 3-stage pipeline CLI — simclr.py / scan.py / selflabel.py / eval.py
rebuilt (Unsupervised-Classification-master top-level entry points).

One entry with a stage subcommand, driven by the same two-file YAML config
style (env + experiment, tpu_ac.config.create_config).  Stage artifacts
flow through the derived paths exactly like the reference
(utils/config.py:25-50): pretext -> top-k neighbors .npy -> scan model ->
selflabel model.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpu_ac.config import create_config
from tpu_ac.cluster.metrics import clustering_scores, hungarian_evaluate
from tpu_ac.data.augment import (
    SimCLRAugmentation,
    StrongAugmentation,
    ValTransform,
    WeakAugmentation,
)
from tpu_ac.data.classification import (
    ArrayDataset,
    load_cifar10,
    load_cifar20,
    load_imagenet,
    load_stl10,
    make_synthetic_classification,
    shuffled_batches,
)
from tpu_ac.data.prefetch import ParallelAugPool
from tpu_ac.models.resnet_cifar import (
    RESNET18_CIFAR,
    RESNET18_STL,
    RESNET50_IMAGENET,
)
from tpu_ac.train.scan import (
    MemoryBank,
    SCANModelConfig,
    clustering_forward,
    contrastive_forward,
    init_clustering_model,
    init_contrastive_model,
    init_train_state,
    make_scan_step,
    make_selflabel_step,
    make_simclr_step,
    scan_evaluate_heads,
)
from tpu_ac.utils import (LaggedFetch, latest_checkpoint,
                          restore_checkpoint, save_checkpoint)


def _load_dataset(cfg, split: str) -> ArrayDataset:
    name = cfg.get("train_db_name", "synthetic")
    root = cfg.get("data_root", "./data")
    if name == "cifar-10":
        return load_cifar10(root, split)
    if name == "cifar-20":
        return load_cifar20(root, split)
    if name == "stl-10":
        return load_stl10(root, "train" if split == "train" else "test")
    if name.startswith("imagenet"):
        # imagenet_50/100/200 (data/imagenet.py ImageNetSubset) need a
        # subset wnid list; full "imagenet" walks every class dir.
        subset = cfg.get("subset_file")
        if subset is None and "_" in name:
            subset = f"{root}/imagenet_subsets/{name}.txt"
        return load_imagenet(root, "train" if split == "train" else "val",
                             subset_file=subset,
                             size=cfg.get("image_size", 224),
                             # at _100/_200 scale the decoded split is tens
                             # of GB: cache to disk + memory-map (set
                             # mmap_cache: in the env/exp yml)
                             mmap_cache=cfg.get("mmap_cache"))
    return make_synthetic_classification(
        n_per_class=cfg.get("synthetic_per_class", 16),
        n_classes=cfg.get("num_classes", 4),
        size=cfg.get("image_size", 32),
        seed=0)


def _mining_mesh(cfg):
    """Optional `mine_dp: N` config key: shard the memory bank's neighbor
    mining over an N-device mesh (ops.distances.knn_ip_sharded) — the
    TPU-native form of the reference's faiss.index_cpu_to_all_gpus
    sharded IndexFlatIP (utils/memory.py:52)."""
    dp = cfg.get("mine_dp")
    if not dp:
        return None
    from tpu_ac.distributed import get_mesh

    return get_mesh(int(dp))


def _train_step_jit(cfg, step_fn, n_batch_args: int):
    """jit a stage's train step, optionally data-parallel.

    Optional `train_dp: N` config key: shard the train batches over an
    N-device mesh (train.scan.dp_shard_step) — the TPU-native form of the
    reference's torch.nn.DataParallel around the SCAN-stage models
    (Unsupervised-Classification-master/scan.py:48, selflabel.py:45,
    simclr.py:44).  Results are numerically equivalent to single-device
    (GSPMD partitions the same program; reductions ride ICI)."""
    dp = cfg.get("train_dp")
    if not dp:
        return jax.jit(step_fn)
    from tpu_ac.distributed import get_mesh
    from tpu_ac.train.scan import dp_shard_step

    return dp_shard_step(step_fn, get_mesh(int(dp)), n_batch_args)


def _model_config(cfg) -> SCANModelConfig:
    name = cfg.get("backbone", "")
    db = cfg.get("train_db_name", "")
    if name == "resnet50" or (not name and db.startswith("imagenet")):
        backbone = RESNET50_IMAGENET
    elif db == "stl-10":
        backbone = RESNET18_STL
    else:
        backbone = RESNET18_CIFAR
    return SCANModelConfig(
        backbone=backbone,
        feature_dim=cfg.get("feature_dim", 128),
        n_clusters=cfg.get("num_classes", 10),
        n_heads=cfg.get("num_heads", 1))


# shuffled drop-last batches, trimmed to the train_dp multiple (shared
# with cli/eval_linear's dp probe loop — one copy of the dp batch rules)
_epoch_batches = shuffled_batches


def _train_dp(cfg) -> int:
    """The ``train_dp`` mesh size as a batch-trim multiple (1 = off)."""
    return int(cfg.get("train_dp") or 1)


def _thunk_transfer(cfg):
    """Host->device hook applied to assembled batches INSIDE the lookahead
    thread, so the upload rides under the previous step's compute (the
    blocking ``device_put`` releases the GIL).  Under ``train_dp`` the
    batch must instead reach the jitted step as host numpy so jit places
    it per its dp ``in_shardings`` (pre-placing on one device would force
    a reshard)."""
    return np.asarray if _train_dp(cfg) > 1 else jax.device_put


def run_simclr(cfg) -> None:
    """Pretext stage (simclr.py:30-149): train, fill memory bank, mine and
    save top-k neighbors."""
    ds = _load_dataset(cfg, "train")
    size = cfg.get("image_size", 32)
    mcfg = _model_config(cfg)
    # two independent views per image: one transform, two rng streams
    # ("i"/"j" keys below — the reference gets independence from two
    # dataloader passes through the same augmentation)
    aug = SimCLRAugmentation(size=size, seed=0)
    pool = ParallelAugPool(cfg.get("num_workers", 8), seed=cfg.get("seed", 0))

    params, bn = init_contrastive_model(cfg.get("seed", 0), mcfg)
    opt = optax.chain(optax.add_decayed_weights(cfg.get("weight_decay", 1e-4)),
                      optax.sgd(cfg.get("lr", 0.4), momentum=0.9))
    state = init_train_state(params, bn, opt)
    ckpt = latest_checkpoint(cfg.pretext_dir, "checkpoint")
    start_epoch = 0
    if ckpt:
        state, meta = restore_checkpoint(ckpt, state)
        start_epoch = meta["extra"]["epoch"] + 1

    step = _train_step_jit(cfg, make_simclr_step(
        mcfg, opt, cfg.get("temperature", 0.1)), n_batch_args=2)
    bs = cfg.get("batch_size", 128)
    put = _thunk_transfer(cfg)
    for epoch in range(start_epoch, cfg.get("epochs", 10)):
        losses = []

        def thunks(epoch=epoch):
            pos = 0
            for idxs in _epoch_batches(len(ds), bs, epoch,
                                       multiple_of=_train_dp(cfg)):
                yield (lambda idxs=idxs, pos=pos: (
                    put(pool.stack(aug, ds.get_pil, idxs, epoch=epoch,
                                   start=pos, stream="i")),
                    put(pool.stack(aug, ds.get_pil, idxs, epoch=epoch,
                                   start=pos, stream="j"))))
                pos += len(idxs)
        fetch = LaggedFetch(lambda v, acc=losses: acc.append(float(v)))
        for xi, xj in pool.lookahead(thunks()):
            state, loss = step(state, xi, xj)
            fetch.push(loss)
        fetch.flush()
        print(f"simclr epoch {epoch}: loss {np.mean(losses):.4f}")
        save_checkpoint(cfg.pretext_dir, "checkpoint", state, step=epoch,
                        extra={"epoch": epoch}, keep=1)

    # final: fill memory bank with DETERMINISTIC val-transform features
    # (simclr.py:64,133 fills through the base/val dataloaders built on
    # get_val_transformations — center crop, no random crop/flip), mine
    # neighbors.  SEQUENTIAL dataset order (like utils.fill_memory_bank):
    # the bank's row r must hold image r, because the mined neighbor
    # indices are consumed by run_scan as dataset indices — a shuffled /
    # tail-dropping fill would silently pair every anchor with a different
    # image's neighbors.
    val_t = ValTransform(size=size)
    bank = MemoryBank(len(ds), mcfg.feature_dim,
                      num_classes=cfg.get("num_classes", 10),
                      mesh=_mining_mesh(cfg))
    for i in range(0, len(ds), bs):
        idxs = np.arange(i, min(i + bs, len(ds)))
        imgs = pool.stack(val_t, ds.get_pil, idxs, keyed=False)
        emb, _, _ = contrastive_forward(state.params, state.bn_state,
                                        jnp.asarray(imgs), mcfg)
        bank.update(np.asarray(emb), ds.labels[idxs])
    pool.close()
    topk = cfg.get("num_neighbors", 20)
    idx, acc = bank.mine_nearest_neighbors(topk)
    print(f"neighbor mining accuracy (top-{topk}): {acc:.4f}")
    np.save(cfg.topk_neighbors_train_path, idx)
    # cross-stage "model" checkpoints carry params+bn ONLY: the consumer
    # (scan stage, tutorial) must not need to know which pretext stage —
    # and therefore which optimizer state structure — produced them
    save_checkpoint(cfg.pretext_dir, "model",
                    {"params": state.params, "bn": state.bn_state}, step=0)


def run_moco(cfg) -> None:
    """MoCo weight-transfer stage (moco.py:64-110): load an official
    MoCo-v2 checkpoint, remap ``module.encoder_q.*`` onto
    backbone/contrastive_head names, save the pretext model, then mine
    top-k neighbors on L2-normalized BACKBONE features — i.e. before the
    MLP head (moco.py:95: contrastive_head = Identity for mining)."""
    import os

    from tpu_ac.data.augment import to_normalized_array
    from tpu_ac.models.convert import moco_to_contrastive_params

    mcfg = _model_config(cfg)
    params, bn = init_contrastive_model(cfg.get("seed", 0), mcfg)

    ckpt_path = cfg.get("moco_checkpoint")
    if ckpt_path and os.path.exists(ckpt_path):
        import torch

        raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        remapped = moco_to_contrastive_params(raw.get("state_dict", raw))
        loaded_p, loaded_bn = {}, {}
        for k, v in remapped.items():
            if k.endswith("num_batches_tracked"):
                continue
            dst = (loaded_bn if k.endswith((".running_mean", ".running_var"))
                   else loaded_p)
            dst[k] = v
        params = {**params, **{k: v for k, v in loaded_p.items()
                               if k in params}}
        bn = {**bn, **{k: v for k, v in loaded_bn.items() if k in bn}}
        print(f"Transferred MoCo weights from {ckpt_path} "
              f"({len(loaded_p)} tensors)")
    else:
        print("No moco_checkpoint configured — using random init. "
              "(zero-egress: place moco_v2_800ep_pretrain.pth.tar locally "
              "and set moco_checkpoint:; the reference downloads it, "
              "moco.py:64-66)")

    save_checkpoint(cfg.pretext_dir, "model",
                    {"params": params, "bn": bn}, step=0)

    @jax.jit
    def backbone_feats(p, b, imgs):
        _, feats, _ = contrastive_forward(p, b, imgs, mcfg)
        return feats / jnp.linalg.norm(feats, axis=1, keepdims=True)

    bs = cfg.get("batch_size", 64)
    for split, topk, path in (
            ("train", cfg.get("num_neighbors", 50),
             cfg.topk_neighbors_train_path),
            ("val", cfg.get("num_neighbors_val", 5),
             cfg.topk_neighbors_val_path)):
        ds = _load_dataset(cfg, split)
        bank = MemoryBank(len(ds), mcfg.backbone.feature_dim,
                          num_classes=cfg.get("num_classes", 10),
                          mesh=_mining_mesh(cfg))
        for i in range(0, len(ds), bs):
            idxs = np.arange(i, min(i + bs, len(ds)))
            imgs = np.stack([to_normalized_array(ds.get_pil(int(j)))
                             for j in idxs])
            emb = backbone_feats(params, bn, jnp.asarray(imgs))
            bank.update(np.asarray(emb), ds.labels[idxs])
        idx, acc = bank.mine_nearest_neighbors(topk)
        np.save(path, idx)
        print(f"moco {split}: top-{topk} neighbors, accuracy {acc:.4f} "
              f"-> {path}")


def run_scan(cfg) -> None:
    """Clustering stage (scan.py:23-137)."""
    ds = _load_dataset(cfg, "train")
    size = cfg.get("image_size", 32)
    mcfg = _model_config(cfg)
    neighbors = np.load(cfg.topk_neighbors_train_path)
    transform = SimCLRAugmentation(size=size, seed=0)

    params, bn = init_clustering_model(cfg.get("seed", 0), mcfg)
    # transfer pretext backbone weights (common_config.py:87-94)
    pre_ckpt = latest_checkpoint(cfg.pretext_dir, "model")
    if pre_ckpt:
        # optimizer-free template: works whether simclr or moco wrote it
        pre_params, pre_bn = init_contrastive_model(cfg.get("seed", 0), mcfg)
        pre, _ = restore_checkpoint(pre_ckpt,
                                    {"params": pre_params, "bn": pre_bn})
        for k, v in pre["params"].items():
            if not k.startswith("contrastive_head") and k in params:
                params[k] = v
        bn = dict(pre["bn"])

    opt = optax.adam(cfg.get("scan_lr", 1e-4))
    state = init_train_state(params, bn, opt)
    step = _train_step_jit(cfg, make_scan_step(
        mcfg, opt, cfg.get("entropy_weight", 2.0),
        update_cluster_head_only=cfg.get("update_cluster_head_only", False)),
        n_batch_args=2)

    bs = cfg.get("batch_size", 128)
    rng = np.random.default_rng(0)
    pool = ParallelAugPool(cfg.get("num_workers", 8), seed=cfg.get("seed", 0))
    put = _thunk_transfer(cfg)
    head_losses = None
    for epoch in range(cfg.get("epochs", 10)):
        totals = []
        # per-head losses ACCUMULATE over the epoch (evaluate_utils.py
        # scan_evaluate sums over the dataset) — a single final batch
        # could rank the wrong head
        head_losses = None

        def thunks(epoch=epoch):
            # neighbor draws stay on the (ordered) head thread, so the
            # rng sequence is identical to the serial loop's
            pos = 0
            for idxs in _epoch_batches(len(ds), bs, epoch,
                                       multiple_of=_train_dp(cfg)):
                def t(idxs=idxs, pos=pos):
                    nbr = neighbors[idxs, :][
                        np.arange(len(idxs)),
                        rng.integers(0, neighbors.shape[1], len(idxs))]
                    a = pool.stack(transform, ds.get_pil, idxs, epoch=epoch,
                                   start=pos, stream="a")
                    n = pool.stack(transform, ds.get_pil, nbr, epoch=epoch,
                                   start=pos, stream="n")
                    return put(a), put(n)
                yield t
                pos += len(idxs)

        def consume(metrics):
            nonlocal head_losses
            totals.append(float(metrics["total"]))
            batch_head = np.asarray(metrics["head_losses"])
            head_losses = (batch_head if head_losses is None
                           else head_losses + batch_head)
        fetch = LaggedFetch(consume)
        for anchors, nbrs in pool.lookahead(thunks()):
            state, metrics = step(state, anchors, nbrs)
            fetch.push(metrics)
        fetch.flush()
        print(f"scan epoch {epoch}: loss {np.mean(totals):.4f}")
    pool.close()
    best = scan_evaluate_heads(head_losses)
    save_checkpoint(cfg.scan_dir, "model",
                    {"params": state.params, "bn": state.bn_state}, step=0,
                    extra={"best_head": best})
    # hungarian eval on train labels incl. Top-5 (scan.py:118-120,
    # evaluate_utils.py:122-159)
    probs = _predict_probs(state.params, state.bn_state, ds, mcfg, size)
    ev = hungarian_evaluate(probs[best], ds.labels)
    print(f"scan best head {best}: hungarian ACC {ev['ACC']:.4f} "
          f"Top-5 {ev['ACC Top-5']:.4f} NMI {ev['NMI']:.4f} "
          f"ARI {ev['ARI']:.4f}")


def _predict_probs(params, bn_state, ds, mcfg, size,
                   batch_size: int = 256, num_workers: int = 8
                   ) -> np.ndarray:
    """[heads, N, C] softmax class probabilities under the DETERMINISTIC
    val transform (get_predictions runs on dataloaders built with
    get_val_transformations, evaluate_utils.py:34-84 + scan.py:66-71)."""
    val_t = ValTransform(size=size)
    pool = ParallelAugPool(num_workers)
    all_logits = []
    for i in range(0, len(ds), batch_size):
        imgs = pool.stack(val_t, ds.get_pil,
                          range(i, min(i + batch_size, len(ds))),
                          keyed=False)
        logits, _, _ = clustering_forward(params, bn_state,
                                          jnp.asarray(imgs), mcfg)
        all_logits.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
    pool.close()
    return np.concatenate(all_logits, axis=1)  # [heads, N, C]


def run_selflabel(cfg) -> None:
    """Self-labeling stage (selflabel.py:28-110)."""
    ds = _load_dataset(cfg, "train")
    size = cfg.get("image_size", 32)
    scan_cfg = _model_config(cfg)
    mcfg = SCANModelConfig(backbone=scan_cfg.backbone,
                           feature_dim=scan_cfg.feature_dim,
                           n_clusters=scan_cfg.n_clusters, n_heads=1)

    # load best SCAN head only (common_config.py:95-106)
    params, bn = init_clustering_model(cfg.get("seed", 0), scan_cfg)
    scan_ckpt = latest_checkpoint(cfg.scan_dir, "model")
    scan_pb, meta = restore_checkpoint(scan_ckpt,
                                       {"params": params, "bn": bn})
    best = meta["extra"].get("best_head", 0)
    sl_params = {k: v for k, v in scan_pb["params"].items()
                 if not k.startswith("cluster_head")}
    sl_params["cluster_head.0.weight"] = scan_pb["params"][
        f"cluster_head.{best}.weight"]
    sl_params["cluster_head.0.bias"] = scan_pb["params"][
        f"cluster_head.{best}.bias"]

    opt = optax.sgd(cfg.get("selflabel_lr", 0.03), momentum=0.9)
    state = init_train_state(sl_params, scan_pb["bn"], opt)
    step = _train_step_jit(cfg, make_selflabel_step(
        mcfg, opt, threshold=cfg.get("confidence_threshold", 0.99),
        apply_class_balancing=cfg.get("apply_class_balancing", True)),
        n_batch_args=2)

    weak = WeakAugmentation(size=size, seed=0)
    strong = StrongAugmentation(size=size, seed=0)
    pool = ParallelAugPool(cfg.get("num_workers", 8), seed=cfg.get("seed", 0))
    bs = cfg.get("batch_size", 128)
    put = _thunk_transfer(cfg)
    for epoch in range(cfg.get("epochs", 5)):
        losses = []

        def thunks(epoch=epoch):
            pos = 0
            for idxs in _epoch_batches(len(ds), bs, epoch,
                                       multiple_of=_train_dp(cfg)):
                yield (lambda idxs=idxs, pos=pos: (
                    put(pool.stack(weak, ds.get_pil, idxs, epoch=epoch,
                                   start=pos, stream="w")),
                    put(pool.stack(strong, ds.get_pil, idxs, epoch=epoch,
                                   start=pos, stream="s"))))
                pos += len(idxs)
        fetch = LaggedFetch(lambda v, acc=losses: acc.append(float(v)))
        for w, s in pool.lookahead(thunks()):
            state, loss = step(state, w, s)
            fetch.push(loss)
        fetch.flush()
        print(f"selflabel epoch {epoch}: loss {np.mean(losses):.4f}")
    pool.close()
    save_checkpoint(cfg.selflabel_dir, "model",
                    {"params": state.params, "bn": state.bn_state}, step=0)
    probs = _predict_probs(state.params, state.bn_state, ds, mcfg, size)
    ev = hungarian_evaluate(probs[0], ds.labels)
    print(f"selflabel hungarian ACC: {ev['ACC']:.4f} "
          f"Top-5 {ev['ACC Top-5']:.4f}")


def run_eval(cfg) -> dict:
    """Final eval (eval.py:30-95): hungarian ACC + NMI/ARI on val split."""
    ds = _load_dataset(cfg, "val")
    size = cfg.get("image_size", 32)
    scan_cfg = _model_config(cfg)
    mcfg = SCANModelConfig(backbone=scan_cfg.backbone,
                           feature_dim=scan_cfg.feature_dim,
                           n_clusters=scan_cfg.n_clusters, n_heads=1)
    params, bn = init_clustering_model(0, mcfg)
    ckpt = latest_checkpoint(cfg.selflabel_dir, "model")
    if ckpt is None:
        raise FileNotFoundError("no selflabel model; run selflabel first")
    pb, _ = restore_checkpoint(ckpt, {"params": params, "bn": bn})
    probs = _predict_probs(pb["params"], pb["bn"], ds, mcfg, size)[0]
    scores = clustering_scores(ds.labels, probs.argmax(-1))
    ev = hungarian_evaluate(probs, ds.labels)
    scores["ACC"] = ev["ACC"]
    scores["ACC Top-5"] = ev["ACC Top-5"]
    print(f"eval: {scores}")
    return scores


def main(argv=None) -> None:
    p = argparse.ArgumentParser("SCAN pipeline (TPU-native)")
    p.add_argument("stage",
                   choices=["simclr", "moco", "scan", "selflabel", "eval"])
    p.add_argument("--config_env", required=True)
    p.add_argument("--config_exp", required=True)
    args = p.parse_args(argv)
    cfg = create_config(args.config_env, args.config_exp)
    {"simclr": run_simclr, "moco": run_moco, "scan": run_scan,
     "selflabel": run_selflabel, "eval": run_eval}[args.stage](cfg)


if __name__ == "__main__":
    main()
