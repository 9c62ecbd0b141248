"""Copydays copy-detection protocol (dino-main/eval_copy_detection.py).

Rebuilds the full protocol the reference ships:

- ``CopydaysDataset``: the 20-block layout (original, strong, 9 jpegqual
  levels, 9 crop levels; eval_copy_detection.py:33-61), queries = every
  block, database = originals only.
- ``gem_cls_features``: CLS token concatenated with GeM(p=4)-pooled patch
  tokens of the last block (eval_copy_detection.py:166-175) — one jitted
  function per batch.
- ``copydays_eval``: optional distractor merging into the database and
  whitening learned on held-out images (center + PCA whit=0.5,
  eval_copy_detection.py:262-281), cosine top-20 retrieval, per-block mAP
  with the strong block's prefix-matched positives
  (eval_copy_detection.py:63-92).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from tpu_ac.train.evals import PCA, compute_ap

JPEG_LEVELS = (3, 5, 8, 10, 15, 20, 30, 50, 75)
CROP_LEVELS = (10, 15, 20, 30, 40, 50, 60, 70, 80)
IMAGE_EXTS = ("jpg", "jpeg", "png", "ppm", "bmp", "pgm", "tif", "tiff",
              "webp")


def is_image_file(name: str) -> bool:
    return name.rsplit(".", 1)[-1].lower() in IMAGE_EXTS


@dataclasses.dataclass
class CopydaysDataset:
    """Block layout of the Copydays benchmark
    (eval_copy_detection.py:33-61)."""

    basedir: str

    @property
    def block_names(self) -> list[str]:
        return (["original", "strong"]
                + [f"jpegqual/{i}" for i in JPEG_LEVELS]
                + [f"crops/{i}" for i in CROP_LEVELS])

    def get_block(self, i: int) -> list[str]:
        dirname = os.path.join(self.basedir, self.block_names[i])
        return [os.path.join(dirname, f)
                for f in sorted(os.listdir(dirname))
                if is_image_file(f)]

    def get_block_filenames(self, subdir: str) -> list[str]:
        dirname = os.path.join(self.basedir, subdir)
        return [f for f in sorted(os.listdir(dirname))
                if is_image_file(f)]

    def query_paths(self) -> tuple[list[str], list[int]]:
        """All blocks concatenated + per-block sizes (queries)."""
        paths, sizes = [], []
        for i in range(len(self.block_names)):
            block = self.get_block(i)
            paths.extend(block)
            sizes.append(len(block))
        return paths, sizes

    def database_paths(self) -> list[str]:
        return self.get_block(0)  # search only among originals

    def eval_result(self, ids: np.ndarray,
                    block_sizes: Sequence[int]) -> dict[str, float]:
        """Per-block mAP from ranked database ids
        (eval_copy_detection.py:63-92).  The 'strong' block matches by
        4-char filename prefix; every other block is a 1:1 index map."""
        results: dict[str, float] = {}
        j0 = 0
        for i, block_name in enumerate(self.block_names):
            j1 = j0 + block_sizes[i]
            rows = ids[j0:j1]
            if block_name != "strong":
                positives_per_query = [[q] for q in range(j1 - j0)]
            else:
                originals = self.get_block_filenames("original")
                strongs = self.get_block_filenames("strong")
                positives_per_query = [
                    [j for j, bname in enumerate(originals)
                     if bname[:4] == qname[:4]]
                    for qname in strongs]
            sum_ap = 0.0
            for qno, row in enumerate(rows):
                positives = positives_per_query[qno]
                ranks = [rank for rank, bno in enumerate(row)
                         if bno in positives]
                sum_ap += compute_ap(np.asarray(ranks), len(positives))
            results[block_name] = sum_ap / max(1, j1 - j0)
            j0 = j1
        return results


def gem_cls_features(tokens: jnp.ndarray, p: float = 4.0) -> jnp.ndarray:
    """[B, 1+N, D] last-block tokens -> [B, 2D] CLS ++ GeM(p) patch pool
    (eval_copy_detection.py:166-175)."""
    cls_tok = tokens[:, 0, :]
    patches = jnp.clip(tokens[:, 1:, :], 1e-6, None)
    gem = jnp.mean(patches ** p, axis=1) ** (1.0 / p)
    return jnp.concatenate([cls_tok, gem], axis=1)


@functools.lru_cache(maxsize=8)
def _gem_fused(embed_fn: Callable) -> Callable:
    """Stable (per embed_fn) tokens+GeM function so extract_features'
    jit-program cache is shared across the query/database/distractor/
    whitening extraction calls."""
    def fused(p, x):
        return gem_cls_features(embed_fn(p, x))

    return fused


def extract_copydetect_features(embed_fn: Callable, images: np.ndarray,
                                batch_size: int = 16, *, mesh=None,
                                params=None) -> np.ndarray:
    """embed_fn: [B,3,H,W] -> final-norm'd last-block tokens [B,1+N,D].

    With ``params`` the tokens+GeM program is jitted here with the weights
    as a replicated jit argument and ``embed_fn(params, batch)`` is the
    tokens fn; with ``mesh`` on top, each batch dp-shards over the mesh
    axis and the replicated feature output lowers to one ICI all_gather —
    the TPU-native form of the reference's DistributedSampler + async
    cross-rank ``all_gather`` assembly (eval_copy_detection.py:162,
    186-194).  Copydays resizes every image to the same square, so the
    batched/sharded path applies uniformly (unlike retrieval's
    variable-shape thumbnails)."""
    if params is not None:
        from tpu_ac.train.evals import extract_features

        return extract_features(_gem_fused(embed_fn), images, batch_size,
                                normalize=False, mesh=mesh, params=params)
    feats = []
    for i in range(0, len(images), batch_size):
        toks = embed_fn(jnp.asarray(images[i:i + batch_size]))
        feats.append(np.asarray(gem_cls_features(toks)))
    return np.concatenate(feats)


def copydays_eval(query_features: np.ndarray,
                  database_features: np.ndarray,
                  dataset: CopydaysDataset,
                  block_sizes: Sequence[int],
                  distractor_features: np.ndarray | None = None,
                  whitening_features: np.ndarray | None = None,
                  topk: int = 20) -> dict[str, float]:
    """Distractor merge + whitening + cosine top-k + per-block mAP
    (eval_copy_detection.py:246-301).  Distractors enlarge the database
    AFTER the originals so ground-truth indices stay valid."""
    database = np.asarray(database_features, np.float32)
    queries = np.asarray(query_features, np.float32)
    if distractor_features is not None and len(distractor_features):
        database = np.concatenate(
            [database, np.asarray(distractor_features, np.float32)])
    if whitening_features is not None and len(whitening_features):
        w = np.asarray(whitening_features, np.float32)
        mean = w.mean(axis=0)
        database = database - mean
        queries = queries - mean
        pca = PCA(dim=database.shape[-1], whit=0.5)
        # Reference quirk reproduced deliberately
        # (eval_copy_detection.py:277-284): the "covariance" is the
        # UNCENTERED second moment w.T@w/n (only database/queries are
        # centered), i.e. cov + mean*mean^T.  Looks like a bug — PCA.fit
        # above centers — but Copydays mAP parity requires matching it;
        # do NOT "fix" without re-checking published numbers.
        pca.train_pca(w.T @ w / len(w))
        database = pca.apply(database)
        queries = pca.apply(queries)

    @jax.jit
    def topk_ids(q, db):
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        dn = db / jnp.linalg.norm(db, axis=1, keepdims=True)
        sim = qn @ dn.T
        k = min(topk, db.shape[0])
        _, idx = jax.lax.top_k(sim, k)
        return idx

    ids = np.asarray(topk_ids(jnp.asarray(queries), jnp.asarray(database)))
    return dataset.eval_result(ids, block_sizes)
