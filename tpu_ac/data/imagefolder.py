"""ImageFolder dataset: <root>/<class>/<image> directory layout.

Equivalent of torchvision.datasets.ImageFolder as used by DINO training
(dino-main/main_dino.py:145) and the linear/kNN evals.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


class ImageFolder:
    def __init__(self, root: str, transform=None):
        self.root = root
        self.transform = transform
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: list[tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if os.path.splitext(fname)[1].lower() in _EXTS:
                    self.samples.append((os.path.join(cdir, fname),
                                         self.class_to_idx[c]))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, target = self.samples[idx]
        img = Image.open(path).convert("RGB")
        if self.transform is not None:
            img = self.transform(img)
        return img, target

    def epoch_batches(self, batch_size: int, *, seed: int, drop_last=True):
        """Shuffled index batches for one epoch (DistributedSampler
        equivalent: shard these across hosts by slicing per process)."""
        order = np.random.default_rng(seed).permutation(len(self.samples))
        end = (len(order) // batch_size * batch_size if drop_last
               else len(order))
        for i in range(0, end, batch_size):
            yield order[i:i + batch_size]
