"""MVTec AD dataset, host-side (numpy/PIL).

Mirrors the reference dataset semantics exactly
(Anomaly-Clustering/models/patchcore/datasets/mvtec.py:36-167):

- directory walk ``<source>/<class>/<split>/<anomaly>/*.png`` with
  ground-truth mask pairing for test anomalies,
- iteration order sorted by (classname, anomaly, filename),
- transform: shorter-edge resize (PIL bilinear, antialiased — what
  torchvision's ``transforms.Resize`` does on PIL input) -> center crop ->
  scale to [0,1] -> ImageNet mean/std normalize,
- items carry classname/anomaly/is_anomaly/image_name/image_path metadata.

TPU-first difference: instead of a batch_size=1 torch DataLoader feeding
the device image-by-image (examples/main.py:211-217 — the reference is
effectively serial), ``batches()`` yields padded fixed-shape [B, 3, H, W]
numpy batches with a validity count, so one jitted program processes the
whole category and XLA sees a single static shape.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Iterator

import numpy as np
from PIL import Image

CLASSNAMES = [
    "bottle", "cable", "capsule", "carpet", "grid",
    "hazelnut", "leather", "metal_nut", "pill", "screw",
    "tile", "toothbrush", "transistor", "wood", "zipper",
]

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


class DatasetSplit(enum.Enum):
    TRAIN = "train"
    VAL = "val"
    TEST = "test"


def _resize_shorter_edge(img: Image.Image, size: int) -> Image.Image:
    """torchvision transforms.Resize(int) semantics: shorter edge -> size."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    """transforms.CenterCrop on an HWC array (torch rounding of offsets)."""
    h, w = arr.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return arr[top:top + size, left:left + size]


def load_image(path: str, resize: int = 256, imagesize: int = 224,
               normalize: bool = True) -> np.ndarray:
    """Decode one image to a [3, imagesize, imagesize] float32 CHW tensor."""
    img = Image.open(path).convert("RGB")
    img = _resize_shorter_edge(img, resize)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = _center_crop(arr, imagesize)
    if normalize:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr.transpose(2, 0, 1)


def load_image_uint8(path: str, resize: int = 256,
                     imagesize: int = 224) -> np.ndarray:
    """Decode to raw uint8 CHW (device-side normalization path: 4x less
    host->device transfer; see tpu_ac.pipeline.CategoryEmbedder)."""
    img = Image.open(path).convert("RGB")
    img = _resize_shorter_edge(img, resize)
    arr = _center_crop(np.asarray(img, dtype=np.uint8), imagesize)
    return arr.transpose(2, 0, 1)


def normalize_on_device(batch_u8, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """jit-safe (x/255 - mean)/std for uint8 CHW batches."""
    import jax.numpy as jnp

    m = jnp.asarray(mean, jnp.float32)[:, None, None]
    s = jnp.asarray(std, jnp.float32)[:, None, None]
    return (batch_u8.astype(jnp.float32) / 255.0 - m) / s


def load_mask(path: str | None, resize: int = 256, imagesize: int = 224) -> np.ndarray:
    """Decode a ground-truth mask to [1, imagesize, imagesize] float32."""
    if path is None:
        return np.zeros((1, imagesize, imagesize), dtype=np.float32)
    img = Image.open(path)
    img = _resize_shorter_edge(img, resize)
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    arr = arr / 255.0
    arr = _center_crop(arr, imagesize)
    return arr[None]


@dataclasses.dataclass
class Item:
    classname: str
    anomaly: str
    image_path: str
    mask_path: str | None

    @property
    def is_anomaly(self) -> int:
        return int(self.anomaly != "good")

    @property
    def image_name(self) -> str:
        return "/".join(self.image_path.split("/")[-4:])


class MVTecDataset:
    """Walks the MVTec directory tree; yields decoded items or padded batches."""

    def __init__(self, source: str, classname: str | None = None,
                 resize: int = 256, imagesize: int = 224,
                 split: DatasetSplit = DatasetSplit.TRAIN,
                 train_val_split: float = 1.0):
        self.source = source
        self.split = split
        self.resize = resize
        self.imagesize = imagesize
        self.classnames_to_use = [classname] if classname is not None else CLASSNAMES
        self.train_val_split = train_val_split
        self.items = self._walk()

    def _walk(self) -> list[Item]:
        items: list[Item] = []
        per_class: dict[str, dict[str, list[str]]] = {}
        masks: dict[str, dict[str, list[str] | None]] = {}
        for classname in self.classnames_to_use:
            classpath = os.path.join(self.source, classname, self.split.value)
            maskroot = os.path.join(self.source, classname, "ground_truth")
            per_class[classname] = {}
            masks[classname] = {}
            for anomaly in os.listdir(classpath):
                apath = os.path.join(classpath, anomaly)
                files = sorted(os.listdir(apath))
                paths = [os.path.join(apath, f) for f in files]
                if self.train_val_split < 1.0:
                    cut = int(len(paths) * self.train_val_split)
                    if self.split == DatasetSplit.TRAIN:
                        paths = paths[:cut]
                    elif self.split == DatasetSplit.VAL:
                        paths = paths[cut:]
                per_class[classname][anomaly] = paths
                if self.split == DatasetSplit.TEST and anomaly != "good":
                    mpath = os.path.join(maskroot, anomaly)
                    mfiles = sorted(os.listdir(mpath))
                    masks[classname][anomaly] = [
                        os.path.join(mpath, f) for f in mfiles]
                else:
                    masks[classname][anomaly] = None
        for classname in sorted(per_class):
            for anomaly in sorted(per_class[classname]):
                for i, ipath in enumerate(per_class[classname][anomaly]):
                    mlist = masks[classname][anomaly]
                    items.append(Item(classname, anomaly, ipath,
                                      mlist[i] if mlist else None))
        return items

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        item = self.items[idx]
        out = {
            "image": load_image(item.image_path, self.resize, self.imagesize),
            "classname": item.classname,
            "anomaly": item.anomaly,
            "is_anomaly": item.is_anomaly,
            "image_name": item.image_name,
            "image_path": item.image_path,
        }
        if self.split == DatasetSplit.TEST:
            out["mask"] = load_mask(item.mask_path, self.resize, self.imagesize)
        return out

    def load_all_images(self, uint8: bool = False,
                        num_workers: int | None = None) -> np.ndarray:
        """Decode the whole split into one [N, 3, H, W] array (host).

        ``uint8=True`` skips host normalization (device-side path).
        Decoding is threaded (PIL releases the GIL during decode/resize) —
        the parallel replacement for the reference's num_workers=0
        DataLoader (examples/main.py:211-217).
        """
        from concurrent.futures import ThreadPoolExecutor

        loader = load_image_uint8 if uint8 else load_image
        if num_workers is None:
            num_workers = min(16, os.cpu_count() or 1)
        if num_workers <= 1 or len(self.items) < 4:
            return np.stack([
                loader(it.image_path, self.resize, self.imagesize)
                for it in self.items
            ])
        with ThreadPoolExecutor(num_workers) as pool:
            arrays = list(pool.map(
                lambda it: loader(it.image_path, self.resize, self.imagesize),
                self.items))
        return np.stack(arrays)

    def batches(self, batch_size: int,
                pad_to_batch: bool = True) -> Iterator[tuple[np.ndarray, int]]:
        """Yield ([B, 3, H, W], n_valid) fixed-shape batches.

        The final partial batch is zero-padded to ``batch_size`` so every
        step reuses the same compiled program.
        """
        n = len(self.items)
        for start in range(0, n, batch_size):
            chunk = self.items[start:start + batch_size]
            imgs = np.stack([
                load_image(it.image_path, self.resize, self.imagesize)
                for it in chunk])
            valid = len(chunk)
            if pad_to_batch and valid < batch_size:
                pad = np.zeros((batch_size - valid, *imgs.shape[1:]),
                               dtype=imgs.dtype)
                imgs = np.concatenate([imgs, pad])
            yield imgs, valid


def make_synthetic_mvtec(root: str, classname: str = "bottle",
                         anomalies: tuple[str, ...] = ("good", "broken_large",
                                                       "contamination"),
                         n_per_anomaly: int = 4, n_train: int = 6,
                         image_size: int = 64, seed: int = 0) -> str:
    """Write a tiny MVTec-layout tree with synthetic PNGs (for tests/bench).

    Each anomaly type gets a visually distinct defect so clustering is
    learnable; ground-truth masks are written for test anomalies.
    """
    rng = np.random.default_rng(seed)
    s = image_size

    def base_texture():
        return (rng.uniform(90, 140, size=(s, s, 3))).astype(np.uint8)

    def save(path, arr):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(arr).save(path)

    for i in range(n_train):
        save(os.path.join(root, classname, "train", "good", f"{i:03d}.png"),
             base_texture())
    for anomaly in anomalies:
        for i in range(n_per_anomaly):
            img = base_texture()
            mask = np.zeros((s, s), dtype=np.uint8)
            if anomaly != "good":
                # deterministic defect geometry per anomaly type (builtin
                # hash() is randomized per process — use a stable digest)
                if sum(anomaly.encode()) % 2 == 0:
                    lo, hi = s // 4, s // 2
                    img[lo:hi, lo:hi] = [220, 40, 40]
                    mask[lo:hi, lo:hi] = 255
                else:
                    c = s // 2 + (i % 3) - 1
                    img[:, c - 2:c + 2] = [40, 40, 220]
                    mask[:, c - 2:c + 2] = 255
                save(os.path.join(root, classname, "ground_truth", anomaly,
                                  f"{i:03d}_mask.png"), mask)
            save(os.path.join(root, classname, "test", anomaly,
                              f"{i:03d}.png"), img)
    return root
