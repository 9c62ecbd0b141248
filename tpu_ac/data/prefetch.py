"""Parallel multi-crop augmentation + batch prefetch for training loops.

The reference feeds DINO through ``DataLoader(num_workers=10,
pin_memory=True)`` (dino-main/main_dino.py:147-154); without an
equivalent, the jitted 20.6 ms train step sits behind 0.7-1.4 s of
single-threaded PIL multi-crop work per batch (measured during the
sustained on-chip run, PERF.md).  ``CropBatchPrefetcher`` is the
TPU-host equivalent:

- a thread pool augments the batch's images concurrently (PIL's C ops —
  decode, resize, blur, affine — release the GIL, so threads scale
  without the multiprocessing serialization cost the reference pays);
- one batch of lookahead: batch i+1 is assembled while the train step
  consumes batch i, so host aug rides under device compute.

Determinism is per-image, not per-stream: each image draws from
``random.Random((seed, epoch, position))``, so the augmentation a sample
receives is independent of worker scheduling — stronger than the
reference's worker-order-dependent torch RNG streams.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np


class CropBatchPrefetcher:
    """Assembles (global_crops, local_crops) batch arrays in background.

    Args:
        get_image: index -> PIL image (e.g. ``lambda i: dataset[i][0]``).
        aug: a multi-crop callable ``aug(img, rng=...) -> [crops]``
            returning ``2 + n_local`` CHW arrays (DINOAugmentation).
        n_local: number of local crops ``aug`` emits after the 2 globals.
        num_workers: augmentation threads (0 = fully serial, no lookahead).
        seed: determinism base for the per-image rng keys.
    """

    def __init__(self, get_image: Callable, aug: Callable, n_local: int,
                 *, num_workers: int = 8, seed: int = 0):
        self.get_image = get_image
        self.aug = aug
        self.n_local = n_local
        self.num_workers = num_workers
        self.seed = seed
        self._pool = (ThreadPoolExecutor(num_workers, "tpu_ac-aug")
                      if num_workers > 0 else None)
        self._head = (ThreadPoolExecutor(1, "tpu_ac-prefetch")
                      if num_workers > 0 else None)

    def _crops_for(self, epoch: int, position: int, index: int):
        # string keys hash via sha512 (process-stable); tuples are not a
        # supported random.Random seed type
        rng = random.Random(f"{self.seed}/{epoch}/{position}")
        return self.aug(self.get_image(index), rng=rng)

    def _assemble(self, epoch: int, start: int, idxs: Sequence[int]):
        args = [(epoch, start + k, int(j)) for k, j in enumerate(idxs)]
        if self._pool is None:
            crops = [self._crops_for(*a) for a in args]
        else:
            crops = list(self._pool.map(lambda a: self._crops_for(*a), args))
        g = np.concatenate([np.stack([c[0] for c in crops]),
                            np.stack([c[1] for c in crops])])
        l = (np.concatenate([np.stack([c[2 + k] for c in crops])
                             for k in range(self.n_local)])
             if self.n_local else None)
        return g, l

    def batches(self, epoch: int, idx_batches: Iterable[Sequence[int]]
                ) -> Iterator[tuple[np.ndarray, np.ndarray | None]]:
        """Yield assembled (g, l) arrays with one batch of lookahead."""
        it = iter(idx_batches)
        if self._head is None:
            pos = 0
            for idxs in it:
                yield self._assemble(epoch, pos, idxs)
                pos += len(idxs)
            return
        pending, pos = None, 0
        try:
            first = next(it)
        except StopIteration:
            return
        pending = self._head.submit(self._assemble, epoch, pos, first)
        pos += len(first)
        for idxs in it:
            nxt = self._head.submit(self._assemble, epoch, pos, idxs)
            pos += len(idxs)
            yield pending.result()
            pending = nxt
        yield pending.result()

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
        if self._head is not None:
            self._head.shutdown(wait=False, cancel_futures=True)
