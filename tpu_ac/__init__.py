"""tpu_ac — a TPU-native (JAX/XLA/Pallas) anomaly-clustering framework.

A from-scratch rebuild of the capabilities of the
KevinWangHP/Anomaly-Clustering research monorepo (Anomaly Clustering on
MVTec AD via PatchCore machinery + DINO ViT backbones, PatchCore anomaly
detection, DINO self-supervised pre-training, and the SCAN unsupervised
classification pipeline), re-architected for TPUs:

- compute path: JAX + XLA + Pallas kernels (MXU matmuls, fused tiled
  pairwise-distance reductions) instead of torch/cuDNN/FAISS,
- scaling: ``jax.sharding.Mesh`` + ``shard_map``/``jit`` with ICI
  collectives instead of NCCL/DDP,
- functional models (parameter pytrees) instead of ``nn.Module`` hooks.

Layout (see SURVEY.md section 7 for the blueprint):
    ops/          torch-exact numerical primitives (adaptive pooling,
                  patchify/unfold, bilinear/bicubic resize, gaussian blur,
                  pairwise distances)
    kernels/      Pallas TPU kernels for the hot paths
    models/       ViT (DINO-compatible), ResNet family, converters
    features/     multi-layer feature taps + embedding pipeline
    cluster/      alpha-weight math, clustering, Hungarian metrics
    detect/       PatchCore detection (coreset, kNN scorer, segmentor)
    data/         MVTec dataset + input pipeline
    train/        DINO trainer, SCAN stages
    distributed/  mesh/sharding utilities
    cli/          reference-compatible command-line entry points
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level access to the subpackages (keeps `import tpu_ac`
    light; heavy deps load on first touch)."""
    import importlib

    _SUBMODULES = {
        "ops", "kernels", "models", "features", "cluster", "detect",
        "data", "train", "distributed", "utils", "viz", "cli", "hub",
        "config", "native", "pipeline",
    }
    if name in _SUBMODULES:
        return importlib.import_module(f"tpu_ac.{name}")
    raise AttributeError(f"module 'tpu_ac' has no attribute '{name}'")
