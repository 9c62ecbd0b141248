"""SCAN unsupervised classification (ECCV'20), TPU-native.

Rebuild of Unsupervised-Classification-master: the three-stage pipeline
(SimCLR pretext -> SCAN clustering -> self-labeling) as pure jitted train
steps over functional models.

- losses (losses/losses.py:11-165): SimCLR NT-Xent (SupContrast form),
  SCAN consistency-BCE minus weighted entropy, confidence-thresholded CE
  with class balancing for self-labeling.
- models (models/models.py:10-62): ContrastiveModel = backbone + MLP head;
  ClusteringModel = backbone + n linear heads.
- memory bank + faiss-IP neighbor mining (utils/memory.py:21-88) becomes
  feature storage + ``tpu_ac.ops.distances.knn_ip`` top-k.

BatchNorm state threads through every step explicitly (params, bn_state) —
the functional replacement for torch's module-held running stats.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_ac.models.resnet_cifar import (
    CifarResNetConfig,
    cifar_resnet_forward,
    init_cifar_resnet,
)
from tpu_ac.ops.distances import knn_ip
from tpu_ac.ops.normalize import l2_normalize

EPS = 1e-8


# --------------------------------------------------------------------------
# Losses (losses/losses.py)
# --------------------------------------------------------------------------

def simclr_loss(features: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """SimCLR NT-Xent on [B, 2, dim] normalized features
    (losses/losses.py:124-165, SupContrast formulation)."""
    b, n, _dim = features.shape
    assert n == 2
    contrast = jnp.concatenate([features[:, 0], features[:, 1]], axis=0)
    anchor = features[:, 0]
    logits = anchor @ contrast.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1,
                                                    keepdims=True))
    # mask out self-contrast (anchor i vs contrast i)
    idx = jnp.arange(b)
    logits_mask = jnp.ones((b, 2 * b)).at[idx, idx].set(0.0)
    pos_mask = jnp.zeros((b, 2 * b)).at[idx, idx + b].set(1.0)
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    return -jnp.mean(jnp.sum(pos_mask * log_prob, axis=1) /
                     jnp.sum(pos_mask, axis=1))


def entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """Entropy of a probability vector/batch (losses/losses.py:67-86)."""
    x = jnp.clip(probs, EPS, None)
    b = x * jnp.log(x)
    if b.ndim == 2:
        return -jnp.mean(jnp.sum(b, axis=1))
    return -jnp.sum(b)


def scan_loss(anchor_logits: jnp.ndarray, neighbor_logits: jnp.ndarray,
              entropy_weight: float = 2.0
              ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SCAN loss (losses/losses.py:89-121): BCE(dot of softmax pair, 1)
    minus weighted batch-entropy.  Returns (total, consistency, entropy)."""
    a = jax.nn.softmax(anchor_logits, axis=1)
    pos = jax.nn.softmax(neighbor_logits, axis=1)
    similarity = jnp.sum(a * pos, axis=1)
    consistency = -jnp.mean(jnp.log(jnp.clip(similarity, EPS, None)))
    ent = entropy(jnp.mean(a, axis=0))
    return consistency - entropy_weight * ent, consistency, ent


def confidence_based_ce(weak_logits: jnp.ndarray, strong_logits: jnp.ndarray,
                        threshold: float = 0.99,
                        apply_class_balancing: bool = True) -> jnp.ndarray:
    """Self-labeling loss (losses/losses.py:25-64): pseudo-labels from
    confident weak-augmentation predictions, CE on strong augmentations,
    optional inverse-frequency class weights.  Masked arithmetic replaces
    the reference's boolean indexing (static shapes under jit)."""
    probs = jax.nn.softmax(weak_logits, axis=1)
    max_prob = jnp.max(probs, axis=1)
    target = jnp.argmax(probs, axis=1)
    mask = (max_prob > threshold).astype(weak_logits.dtype)
    n = jnp.sum(mask)
    c = weak_logits.shape[1]

    onehot = jax.nn.one_hot(target, c, dtype=weak_logits.dtype)
    if apply_class_balancing:
        counts = jnp.sum(onehot * mask[:, None], axis=0)  # [c]
        freq = jnp.where(counts > 0, n / jnp.clip(counts, 1.0, None), 1.0)
        sample_w = freq[target]
    else:
        sample_w = jnp.ones_like(max_prob)

    logp = jax.nn.log_softmax(strong_logits, axis=1)
    per_sample = -jnp.sum(onehot * logp, axis=1) * sample_w * mask
    # torch cross_entropy(weight=...) 'mean' divides by the sum of weights
    denom = jnp.clip(jnp.sum(sample_w * mask), EPS, None)
    return jnp.sum(per_sample) / denom


# --------------------------------------------------------------------------
# Models (models/models.py)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SCANModelConfig:
    backbone: CifarResNetConfig = CifarResNetConfig()
    feature_dim: int = 128   # contrastive head output
    n_clusters: int = 10
    n_heads: int = 1
    head: str = "mlp"        # "mlp" | "linear" (models.py:18-26)


def init_contrastive_model(seed: int, cfg: SCANModelConfig):
    """ContrastiveModel params (models/models.py:10-31)."""
    params, bn_state = init_cifar_resnet(seed, cfg.backbone)
    rng = np.random.default_rng(seed + 1)
    d = cfg.backbone.feature_dim
    head = {}
    if cfg.head == "mlp":
        head["contrastive_head.0.weight"] = (
            rng.standard_normal((d, d)) / np.sqrt(d)).astype(np.float32)
        head["contrastive_head.0.bias"] = np.zeros((d,), np.float32)
        head["contrastive_head.2.weight"] = (
            rng.standard_normal((cfg.feature_dim, d)) / np.sqrt(d)
        ).astype(np.float32)
        head["contrastive_head.2.bias"] = np.zeros((cfg.feature_dim,),
                                                   np.float32)
    else:
        head["contrastive_head.weight"] = (
            rng.standard_normal((cfg.feature_dim, d)) / np.sqrt(d)
        ).astype(np.float32)
        head["contrastive_head.bias"] = np.zeros((cfg.feature_dim,),
                                                 np.float32)
    params = dict(params) | {k: jnp.asarray(v) for k, v in head.items()}
    return params, bn_state


def contrastive_forward(params, bn_state, images, cfg: SCANModelConfig,
                        *, train: bool = False):
    """backbone -> head -> L2-normalized embedding (models.py:28-31)."""
    feats, new_state = cifar_resnet_forward(params, bn_state, images,
                                            cfg.backbone, train=train)
    if "contrastive_head.0.weight" in params:
        h = feats @ params["contrastive_head.0.weight"].T + params[
            "contrastive_head.0.bias"]
        h = jax.nn.relu(h)
        h = h @ params["contrastive_head.2.weight"].T + params[
            "contrastive_head.2.bias"]
    else:
        h = feats @ params["contrastive_head.weight"].T + params[
            "contrastive_head.bias"]
    return l2_normalize(h, axis=1), feats, new_state


def init_clustering_model(seed: int, cfg: SCANModelConfig):
    """ClusteringModel params: backbone + n linear heads (models.py:34-51)."""
    params, bn_state = init_cifar_resnet(seed, cfg.backbone)
    rng = np.random.default_rng(seed + 2)
    d = cfg.backbone.feature_dim
    heads = {}
    for i in range(cfg.n_heads):
        heads[f"cluster_head.{i}.weight"] = (
            rng.standard_normal((cfg.n_clusters, d)) / np.sqrt(d)
        ).astype(np.float32)
        heads[f"cluster_head.{i}.bias"] = np.zeros((cfg.n_clusters,),
                                                   np.float32)
    params = dict(params) | {k: jnp.asarray(v) for k, v in heads.items()}
    return params, bn_state


def clustering_forward(params, bn_state, images, cfg: SCANModelConfig,
                       *, train: bool = False):
    """backbone -> per-head logits [n_heads, B, C] (models.py:53-62)."""
    feats, new_state = cifar_resnet_forward(params, bn_state, images,
                                            cfg.backbone, train=train)
    logits = jnp.stack([
        feats @ params[f"cluster_head.{i}.weight"].T +
        params[f"cluster_head.{i}.bias"]
        for i in range(cfg.n_heads)
    ])
    return logits, feats, new_state


# --------------------------------------------------------------------------
# Memory bank (utils/memory.py)
# --------------------------------------------------------------------------

class MemoryBank:
    """Feature store + kNN monitors + neighbor mining (memory.py:6-88)."""

    def __init__(self, n: int, dim: int, num_classes: int,
                 temperature: float = 0.1, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — neighbor mining
        row-shards the bank over its "dp" axis (knn_ip_sharded), the
        TPU-native form of the reference's faiss.index_cpu_to_all_gpus
        sharded IndexFlatIP (memory.py:52)."""
        self.features = np.zeros((n, dim), np.float32)
        self.targets = np.zeros((n,), np.int64)
        self.ptr = 0
        self.num_classes = num_classes
        self.temperature = temperature
        self.mesh = mesh

    def update(self, features: np.ndarray, targets: np.ndarray) -> None:
        # circular write: a batch crossing the end of the bank wraps
        # (the plain slice write would raise on the shape mismatch)
        b = len(features)
        n = len(self.features)
        idx = (self.ptr + np.arange(b)) % n
        self.features[idx] = np.asarray(features)
        self.targets[idx] = np.asarray(targets)
        self.ptr = (self.ptr + b) % n

    def reset(self) -> None:
        self.ptr = 0

    def mine_nearest_neighbors(self, topk: int,
                               calculate_accuracy: bool = True):
        """faiss-IP search over the bank (memory.py:46-65): returns
        [N, topk+1] indices (self included) and neighbor label accuracy."""
        if self.mesh is not None:
            from tpu_ac.ops.distances import knn_ip_sharded

            _sims, idx = knn_ip_sharded(jnp.asarray(self.features),
                                        jnp.asarray(self.features),
                                        topk + 1, self.mesh)
        else:
            _sims, idx = knn_ip(jnp.asarray(self.features),
                                jnp.asarray(self.features), topk + 1)
        idx = np.asarray(idx)
        if calculate_accuracy:
            neighbor_targets = self.targets[idx[:, 1:]]
            anchor_targets = self.targets[:, None]
            acc = float(np.mean(neighbor_targets == anchor_targets))
            return idx, acc
        return idx

    def weighted_knn(self, predictions_features: np.ndarray,
                     k: int = 200) -> np.ndarray:
        """Temperature-weighted kNN vote (memory.py:21-38)."""
        k = min(k, len(self.features))
        sims, idx = knn_ip(jnp.asarray(predictions_features),
                           jnp.asarray(self.features), k)
        sims, idx = np.asarray(sims), np.asarray(idx)
        weights = np.exp(sims / self.temperature)
        votes = np.zeros((len(predictions_features), self.num_classes))
        for c in range(self.num_classes):
            votes[:, c] = np.sum(weights * (self.targets[idx] == c), axis=1)
        return votes.argmax(axis=1)


# --------------------------------------------------------------------------
# Train steps (utils/train_utils.py)
# --------------------------------------------------------------------------

class SCANTrainState(NamedTuple):
    params: dict[str, jnp.ndarray]
    bn_state: dict[str, jnp.ndarray]
    opt_state: Any
    step: jnp.ndarray


def _sgd(lr: float, momentum: float = 0.9, weight_decay: float = 1e-4,
         nesterov: bool = False):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum, nesterov=nesterov))


def init_train_state(params, bn_state, optimizer) -> SCANTrainState:
    return SCANTrainState(params=dict(params), bn_state=dict(bn_state),
                          opt_state=optimizer.init(dict(params)),
                          step=jnp.zeros((), jnp.int32))


def make_simclr_step(cfg: SCANModelConfig, optimizer,
                     temperature: float = 0.1):
    """simclr_train (train_utils.py:10-40): two views -> NT-Xent."""

    def step(state: SCANTrainState, images_i, images_j):
        def loss_fn(params, bn_state):
            b = images_i.shape[0]
            both = jnp.concatenate([images_i, images_j])
            emb, _feats, new_bn = contrastive_forward(
                params, bn_state, both, cfg, train=True)
            features = jnp.stack([emb[:b], emb[b:]], axis=1)
            return simclr_loss(features, temperature), new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return SCANTrainState(params, new_bn, opt_state, state.step + 1), loss

    return step


def make_scan_step(cfg: SCANModelConfig, optimizer,
                   entropy_weight: float = 2.0,
                   update_cluster_head_only: bool = False):
    """scan_train (train_utils.py:43-96): anchor/neighbor consistency.

    Loss is summed over heads (the reference backprops the total);
    ``update_cluster_head_only`` freezes the backbone (scan.py eval pass /
    'head only' mode) by zeroing backbone grads.
    """

    # head-only mode matches the reference's model.eval() (train_utils.py
    # scan_train: "No need to update BN"): running-stat BN, no stat updates
    bn_train = not update_cluster_head_only

    def step(state: SCANTrainState, anchors, neighbors):
        def loss_fn(params, bn_state):
            a_logits, _, bn1 = clustering_forward(params, bn_state, anchors,
                                                  cfg, train=bn_train)
            n_logits, _, bn2 = clustering_forward(params, bn1, neighbors,
                                                  cfg, train=bn_train)
            totals = []
            for h in range(cfg.n_heads):
                total, _c, _e = scan_loss(a_logits[h], n_logits[h],
                                          entropy_weight)
                totals.append(total)
            return jnp.sum(jnp.stack(totals)), (bn2, jnp.stack(totals))

        (loss, (new_bn, head_losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)
        if update_cluster_head_only:
            grads = {k: (g if k.startswith("cluster_head") else
                         jnp.zeros_like(g)) for k, g in grads.items()}
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if update_cluster_head_only:
            # zeroed GRADS alone do not freeze under decoupled weight
            # decay (add_decayed_weights injects wd*p into the updates
            # regardless of the gradient); the reference freezes by
            # giving the optimizer only the head params
            # (common_config.py:254-266) — zeroing the UPDATES is the
            # pytree-stable equivalent
            updates = {k: (u if k.startswith("cluster_head") else
                           jnp.zeros_like(u)) for k, u in updates.items()}
        params = optax.apply_updates(state.params, updates)
        return (SCANTrainState(params, new_bn, opt_state, state.step + 1),
                {"total": loss, "head_losses": head_losses})

    return step


def make_selflabel_step(cfg: SCANModelConfig, optimizer,
                        threshold: float = 0.99,
                        apply_class_balancing: bool = True,
                        ema_momentum: float | None = None):
    """selflabel_train (train_utils.py:99-128): weak/strong pseudo-labeling.
    Assumes a single cluster head (selflabel keeps only the best SCAN head,
    common_config.py:95-106).  Optional EMA of params (utils/ema.py:6-18)."""

    def step(state: SCANTrainState, images_weak, images_strong,
             ema_params=None):
        def loss_fn(params, bn_state):
            # the reference keeps model.train() for BOTH passes
            # (train_utils.py selflabel_train): the weak/pseudo-label pass
            # uses batch stats and advances the running stats, then the
            # strong pass advances them again
            weak_logits, _, bn1 = clustering_forward(
                params, bn_state, images_weak, cfg, train=True)
            weak_logits = jax.lax.stop_gradient(weak_logits[0])
            strong_logits, _, new_bn = clustering_forward(
                params, bn1, images_strong, cfg, train=True)
            loss = confidence_based_ce(weak_logits, strong_logits[0],
                                       threshold, apply_class_balancing)
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = SCANTrainState(params, new_bn, opt_state, state.step + 1)
        if ema_momentum is not None and ema_params is not None:
            ema_params = jax.tree.map(
                lambda e, p: ema_momentum * e + (1 - ema_momentum) * p,
                ema_params, params)
            return new_state, loss, ema_params
        return new_state, loss

    return step


def dp_shard_step(step_fn, mesh, n_batch_args: int,
                  axis_name: str = "dp"):
    """Data-parallel jit of a ``make_{simclr,scan,selflabel}_step`` step.

    The reference wraps the SCAN-stage models in ``torch.nn.DataParallel``
    (Unsupervised-Classification-master/scan.py:48, selflabel.py:45,
    simclr.py:44); the TPU-native equivalent keeps the SAME step program
    and lets GSPMD partition it: the train state (params/bn/opt) is
    replicated, the first ``n_batch_args`` array arguments after the state
    are sharded on the mesh's ``axis_name`` axis, and every cross-batch
    reduction in the traced program (batch-stat moments, the NT-Xent
    all-pairs similarity, loss means, gradient sums) lowers to ICI
    collectives.  Semantics are the single-device program's — unlike
    DataParallel's per-replica BatchNorm, batch statistics here are
    computed over the FULL batch (sync-BN), so the sharded step is
    numerically equivalent to the unsharded one (equivalence-tested on the
    8-device virtual mesh, tests/test_distributed.py).

    The per-step global batch must be divisible by the dp axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))
    return jax.jit(step_fn,
                   in_shardings=(rep,) + (shard,) * n_batch_args,
                   out_shardings=rep)


def scan_evaluate_heads(head_losses: np.ndarray) -> int:
    """Lowest-loss head selection (evaluate_utils.py:87-119)."""
    return int(np.argmin(head_losses))


@functools.lru_cache(maxsize=None)
def _jitted_contrastive_embed(cfg: SCANModelConfig):
    """Cached jit of the contrastive embed so repeated eval calls (one per
    epoch in the reference loop) reuse one compiled program."""
    return jax.jit(lambda p, b, x: contrastive_forward(p, b, x, cfg)[0])


@functools.lru_cache(maxsize=None)
def _jitted_head_probs(cfg: SCANModelConfig, head: int):
    """Cached jit of per-head softmax probabilities (eval.py prototypes)."""
    return jax.jit(lambda p, b, x: jax.nn.softmax(
        clustering_forward(p, b, x, cfg)[0][head], axis=1))


def contrastive_evaluate(params, bn_state, images: np.ndarray,
                         targets: np.ndarray, bank: "MemoryBank",
                         cfg: SCANModelConfig, batch_size: int = 256
                         ) -> float:
    """Weighted-kNN accuracy monitor on memory-bank features
    (utils/evaluate_utils.py:16-31 contrastive_evaluate)."""
    fwd = _jitted_contrastive_embed(cfg)
    correct = 0
    for i in range(0, len(images), batch_size):
        emb = fwd(params, bn_state, jnp.asarray(images[i:i + batch_size]))
        pred = bank.weighted_knn(np.asarray(emb))
        correct += int(np.sum(pred == targets[i:i + batch_size]))
    return correct / len(images)


def get_prototypes(params, bn_state, images: np.ndarray,
                   cfg: SCANModelConfig, head: int = 0,
                   batch_size: int = 256) -> np.ndarray:
    """Most-confident sample index per cluster
    (Unsupervised-Classification-master/eval.py:96-128)."""
    fwd = _jitted_head_probs(cfg, head)
    all_probs = []
    for i in range(0, len(images), batch_size):
        all_probs.append(np.asarray(
            fwd(params, bn_state, jnp.asarray(images[i:i + batch_size]))))
    probs = np.concatenate(all_probs)
    preds = probs.argmax(1)
    protos = np.full(cfg.n_clusters, -1, np.int64)
    for c in range(cfg.n_clusters):
        members = np.where(preds == c)[0]
        if len(members):
            protos[c] = members[np.argmax(probs[members, c])]
    return protos
