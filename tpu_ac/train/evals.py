"""DINO evaluation suites, TPU-native.

Rebuilds of dino-main's eval workloads:

- k-NN classification (eval_knn.py:96-183): feature extraction is a
  batched jitted forward (the reference's async all_gather rank-0 feature
  matrix becomes either a single-process array or a dp-sharded array XLA
  gathers); the classifier itself is the temperature-weighted cosine vote.
- Linear probe (eval_linear.py:31-281): SGD-trained linear classifier on
  frozen backbone features (optionally avgpooled intermediate layers).
- PCA whitening (dino-main/utils.py:654-705) and retrieval AP/mAP
  (utils.py:708-812) for the image-retrieval / copy-detection workloads.
- multi_scale feature ensembling (utils.py:815-829).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_ac.ops.normalize import l2_normalize
from tpu_ac.ops.interpolate import interpolate_bilinear


@functools.lru_cache(maxsize=64)
def _jitted_extractor(embed_fn: Callable, mesh):
    """One jit wrapper per (embed_fn, mesh) so repeated extract_features
    calls (train/query/distractor/whitening splits) share the trace +
    compile cache instead of re-jitting per call."""
    if mesh is None:
        return jax.jit(embed_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.jit(
        embed_fn,
        in_shardings=(rep, NamedSharding(mesh, P(mesh.axis_names[0]))),
        out_shardings=rep)


def extract_features(embed_fn: Callable, images: np.ndarray,
                     batch_size: int = 64, normalize: bool = True,
                     mesh=None, params=None) -> np.ndarray:
    """Batched feature extraction (eval_knn.py:96-139): one jitted program
    over padded fixed-size batches.

    With ``mesh`` (a 1-axis ``jax.sharding.Mesh``) each batch is sharded
    over the mesh's first axis and the feature output is replicated — the
    TPU-native form of the reference's cross-rank pattern (every DDP rank
    embeds its subset, then ``all_gather`` assembles the rank-0 feature
    matrix, eval_knn.py:118-139): GSPMD partitions the embed and lowers
    the replicated output to one all_gather on ICI.  ``batch_size`` must
    be divisible by the axis size, and ``params`` is REQUIRED:
    ``embed_fn(params, batch)`` is jitted here with the weights as a
    replicated jit ARGUMENT — a closed-over param tree would inline the
    model (hundreds of MB for a ViT-B) into the HLO, which remote compile
    services reject and which defeats compile caching.  Passing ``params``
    without ``mesh`` jits ``embed_fn`` the same way single-device;
    without either, ``embed_fn(batch)`` is called as the caller built it.
    """
    fn = embed_fn
    if params is not None:
        if mesh is not None and batch_size % mesh.devices.size:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{mesh.devices.size}")
        jitted = _jitted_extractor(embed_fn, mesh)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # no-op if the caller already placed them with this sharding
            device_params = jax.device_put(params,
                                           NamedSharding(mesh, P()))
        else:
            device_params = jax.device_put(params)
        fn = lambda x: jitted(device_params, x)  # noqa: E731
    elif mesh is not None:
        raise ValueError(
            "extract_features(mesh=...) requires params= so the weights "
            "travel as a jit argument (closing over a param tree inlines "
            "the model into the HLO)")
    n = images.shape[0]
    pad = (-n) % batch_size
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
    feats = []
    for i in range(0, images.shape[0], batch_size):
        f = fn(jnp.asarray(images[i:i + batch_size]))
        if normalize:
            f = l2_normalize(f, axis=1)
        feats.append(np.asarray(f))
    return np.concatenate(feats)[:n]


def knn_classifier(train_features: np.ndarray, train_labels: np.ndarray,
                   test_features: np.ndarray, test_labels: np.ndarray,
                   k: int, T: float, num_classes: int = 1000
                   ) -> tuple[float, float]:
    """Weighted k-NN vote (eval_knn.py:142-183): cosine top-k, exp(sim/T)
    weights, one-hot scatter sum.  Returns (top1, top5) percentages."""
    tf = jnp.asarray(train_features)
    labels = jnp.asarray(train_labels)

    # train features/labels travel as jit ARGUMENTS — a closure would
    # inline the (potentially >1 GB) bank into the HLO, which remote
    # compile services reject and which defeats compile caching.
    @functools.partial(jax.jit, static_argnames=("kk", "n_cls"))
    def chunk_probs(q, bank, lab, *, kk, n_cls):
        sims = q @ bank.T
        top_sims, idx = jax.lax.top_k(sims, kk)
        neigh = lab[idx]                                     # [b, k]
        onehot = jax.nn.one_hot(neigh, n_cls)                # [b, k, C]
        w = jnp.exp(top_sims / T)[..., None]
        return jnp.sum(onehot * w, axis=1)

    top1 = top5 = total = 0
    chunk = max(1, len(test_features) // 100)
    for i in range(0, len(test_features), chunk):
        q = jnp.asarray(test_features[i:i + chunk])
        targets = test_labels[i:i + chunk]
        probs = np.asarray(chunk_probs(q, tf, labels, kk=k,
                                       n_cls=num_classes))
        order = np.argsort(-probs, axis=1)
        top1 += int(np.sum(order[:, 0] == targets))
        kk = min(5, k)
        top5 += int(np.sum(order[:, :kk] == targets[:, None]))
        total += len(targets)
    return 100.0 * top1 / total, 100.0 * top5 / total


class LinearProbeState(NamedTuple):
    weight: jnp.ndarray
    bias: jnp.ndarray
    opt_state: object


def make_linear_probe(feature_dim: int, num_classes: int, lr: float = 0.001,
                      momentum: float = 0.9, weight_decay: float = 0.0,
                      seed: int = 0, mesh=None):
    """Linear probe on frozen features (eval_linear.py:237-254: weights
    init trunc-normal 0.01, bias zero; SGD momentum).

    Returns (state, train_step(state, feats, labels, lr) -> (state, loss),
    predict(state, feats) -> logits).

    With ``mesh`` the probe trains data-parallel — the reference
    DDP-wraps its LinearClassifier (eval_linear.py:62): the probe state
    is replicated, each (feats, labels) batch is sharded over the mesh
    axis, and the loss mean / gradient reductions lower to ICI psums.
    Numerically the single-device program (the global-batch mean equals
    DDP's per-replica mean + gradient averaging at equal shard sizes);
    the per-step batch must be divisible by the axis size.
    """
    rng = np.random.default_rng(seed)
    w = jnp.asarray((rng.standard_normal((num_classes, feature_dim)) * 0.01
                     ).astype(np.float32))
    b = jnp.zeros((num_classes,), jnp.float32)
    opt = optax.chain(optax.add_decayed_weights(weight_decay),
                      optax.sgd(1.0, momentum=momentum))  # lr applied below
    state = LinearProbeState(w, b, opt.init({"w": w, "b": b}))

    def _train_step(state: LinearProbeState, feats, labels, lr):
        def loss_fn(p):
            logits = feats @ p["w"].T + p["b"]
            logp = jax.nn.log_softmax(logits)
            onehot = jax.nn.one_hot(labels, num_classes)
            return -jnp.mean(jnp.sum(onehot * logp, axis=1))

        params = {"w": state.weight, "b": state.bias}
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, state.opt_state, params)
        updates = jax.tree.map(lambda u: lr * u, updates)
        params = optax.apply_updates(params, updates)
        return LinearProbeState(params["w"], params["b"], opt_state), loss

    def _predict(state: LinearProbeState, feats):
        return feats @ state.weight.T + state.bias

    # predict stays an unconstrained jit: val sets have arbitrary sizes
    # (no divisibility guarantee) and a [N, C] logit matrix needs no dp
    predict = jax.jit(_predict)
    if mesh is None:
        return state, jax.jit(_train_step), predict
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    train_step = jax.jit(_train_step,
                         in_shardings=(rep, shard, shard, rep),
                         out_shardings=rep)
    return jax.device_put(state, rep), train_step, predict


class PCA:
    """PCA + whitening (dino-main/utils.py:654-705)."""

    def __init__(self, dim: int = 256, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.mean: np.ndarray | None = None
        self.dvt: np.ndarray | None = None

    def train_pca(self, cov: np.ndarray) -> None:
        d, v = np.linalg.eigh(cov)
        eps = d.max() * 1e-5
        d[d < eps] = eps
        idx = np.argsort(d)[::-1][:self.dim]
        d, v = d[idx], v[:, idx]
        self.dvt = np.diag(1.0 / d ** self.whit) @ v.T

    def fit(self, x: np.ndarray) -> None:
        """Convenience: center + covariance + train."""
        self.mean = x.mean(axis=0)
        xc = x - self.mean
        self.train_pca(xc.T @ xc / len(xc))

    def apply(self, x: np.ndarray) -> np.ndarray:
        if self.mean is not None:
            x = x - self.mean
        return (self.dvt @ x.T).T


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from zero-based positive ranks (utils.py:708-739)."""
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in range(nimgranks):
        rank = ranks[j]
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(ranks: np.ndarray, gnd: list[dict], kappas=()) -> tuple:
    """mAP / per-query AP / precision@kappa (utils.py:742-812).

    ranks: [db_size, n_queries] zero-based ranking; gnd[i] dicts with 'ok'
    (positives) and optional 'junk' indices.
    """
    mAP = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    for i in range(nq):
        qgnd = np.asarray(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        qgndj = np.asarray(gnd[i].get("junk", []))
        pos = np.isin(ranks[:, i], qgnd).nonzero()[0]
        junk = (np.isin(ranks[:, i], qgndj).nonzero()[0]
                if qgndj.size else np.asarray([], dtype=int))
        if junk.size:
            # shift positive ranks down by the number of junk before them
            pos = pos - np.searchsorted(junk, pos)
        ap = compute_ap(pos, len(qgnd))
        mAP += ap
        aps[i] = ap
        # precision@kappa with the reference's kq truncation
        # (utils.py:804-806): 1-based positions, denominator
        # min(max(pos), kappa) — a query whose every positive ranks
        # within kappa scores 1.0, not n_pos/kappa
        pos1 = pos + 1
        for j, kappa in enumerate(kappas):
            kq = min(int(pos1.max()), kappa) if pos1.size else kappa
            prs[i, j] = (pos1 <= kq).sum() / kq if kq else 0.0
        pr += prs[i, :]
    denom = max(1, nq - nempty)
    return mAP / denom, aps, pr / denom, prs


def multi_scale(images: jnp.ndarray, embed_fn: Callable) -> jnp.ndarray:
    """Feature ensembling over scales 1, 1/sqrt(2), 1/2 (utils.py:815-829)."""
    v = None
    for s in (1.0, 1.0 / (2 ** 0.5), 0.5):
        if s == 1.0:
            inp = images
        else:
            h = int(round(images.shape[2] * s / 2) * 2)
            w = int(round(images.shape[3] * s / 2) * 2)
            inp = interpolate_bilinear(images, size=(h, w))
        feats = embed_fn(inp)
        v = feats if v is None else v + feats
    v /= 3
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def retrieval_ranks(query_features: np.ndarray,
                    db_features: np.ndarray) -> np.ndarray:
    """Similarity ranking for image retrieval (eval_image_retrieval.py /
    eval_copy_detection.py): returns ranks [db_size, n_queries] —
    ranks[r, q] = db index at rank r for query q (cosine/IP on whatever
    features are given; the reference L2-normalizes or PCA-whitens first).
    """
    sims = np.asarray(db_features) @ np.asarray(query_features).T
    return np.argsort(-sims, axis=0)


def revisited_retrieval_eval(query_features: np.ndarray,
                             db_features: np.ndarray, gnd: list[dict],
                             kappas=(1, 5, 10)) -> dict:
    """Revisited-Oxford/Paris Medium + Hard evaluation
    (dino-main/eval_image_retrieval.py:169-200).

    Features are L2-normalized here (the reference normalizes before the
    similarity matmul); ``gnd`` is the raw per-query ground truth with
    easy/hard/junk index arrays from the gnd pickle.
    Returns {"mAP_M", "mAP_H", "mP@k_M", "mP@k_H"} (fractions, not %).
    """
    from tpu_ac.data.oxford_paris import revisited_splits

    def l2n(x):
        x = np.asarray(x, np.float64)
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    ranks = retrieval_ranks(l2n(query_features), l2n(db_features))
    gnd_m, gnd_h = revisited_splits(gnd)
    map_m, _, pr_m, _ = compute_map(ranks, gnd_m, kappas)
    map_h, _, pr_h, _ = compute_map(ranks, gnd_h, kappas)
    return {"mAP_M": float(map_m), "mAP_H": float(map_h),
            "mP@k_M": np.asarray(pr_m), "mP@k_H": np.asarray(pr_h)}


def image_retrieval_eval(query_features: np.ndarray,
                         db_features: np.ndarray, gnd: list[dict],
                         kappas=(1, 5, 10)) -> dict:
    """End-to-end retrieval evaluation: rank + mAP + precision@k
    (dino-main/eval_image_retrieval.py:150-200 revisited-Oxford protocol
    for a single difficulty split)."""
    ranks = retrieval_ranks(query_features, db_features)
    m, aps, pr, _ = compute_map(ranks, gnd, kappas)
    return {"mAP": float(m), "aps": aps, "pr@k": pr}
