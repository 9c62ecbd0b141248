"""Feature extraction & embedding core — TPU-native replacement for the
reference's PatchCore machinery (Anomaly-Clustering/models/patchcore/
{common.py,patchcore.py}).

Instead of nn.Module forward hooks + per-image python loops, the embedding
is one pure, jittable function over a whole image batch: multi-layer ViT
taps -> CLS-drop/grid reshape -> ad-hoc LayerNorm -> 3x3 patchify ->
per-layer adaptive pool (as an MXU matmul) -> cross-layer aggregation.
"""

from tpu_ac.features.embedding import (
    EmbedConfig,
    embed_feature_maps,
    embed_vit_features,
    embed_resnet_features,
    aggregate_layer_patches,
    build_embedder,
)

__all__ = [
    "EmbedConfig",
    "embed_feature_maps",
    "embed_vit_features",
    "embed_resnet_features",
    "aggregate_layer_patches",
    "build_embedder",
]
