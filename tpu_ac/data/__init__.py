"""Data layer: MVTec AD dataset + host-side input pipeline.

Replaces the reference's torch Dataset/DataLoader stack
(Anomaly-Clustering/models/patchcore/datasets/mvtec.py) with a pure
numpy/PIL loader producing device-ready batches: decode -> shorter-edge
resize -> center crop -> normalize, batched and padded for static shapes.
"""

from tpu_ac.data.mvtec import (
    CLASSNAMES,
    IMAGENET_MEAN,
    IMAGENET_STD,
    DatasetSplit,
    MVTecDataset,
    load_image,
    make_synthetic_mvtec,
)

__all__ = [
    "CLASSNAMES",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "DatasetSplit",
    "MVTecDataset",
    "load_image",
    "make_synthetic_mvtec",
]
