"""PatchCore anomaly detector (reference: models/patchcore/patchcore.py:20-274).

fit = embed all normal images -> coreset-subsample the patch bank ->
store as the k-NN memory; predict = embed test images -> per-patch k-NN
squared distance -> image score (max over patches) + segmentation mask
(bilinear rescale + gaussian blur of the patch-score grid).

The detector is built around a batched ``embed_fn: [B,3,H,W] -> [B,P,D]``
(tpu_ac.features.embedding) instead of the reference's hook-laden
nn.Module stack, so any backbone family plugs in.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from tpu_ac.detect.sampler import IdentitySampler
from tpu_ac.detect.scorer import NearestNeighbourScorer
from tpu_ac.detect.segmentor import RescaleSegmentor


class PatchCore:
    def __init__(self, embed_fn, featuresampler=None,
                 anomaly_score_num_nn: int = 1,
                 target_size=(224, 224), batch_size: int = 8,
                 config: dict | None = None,
                 nn_method: str = "exact", mesh=None):
        """``nn_method``: "exact" = FaissNN-equivalent flat L2;
        "ivfpq" / "ivfflat" = ApproximateFaissNN-equivalent inverted-file
        search (common.py:100-126).  ``mesh``: shard the exact scorer's
        memory bank over the mesh's "dp" axis (multi-chip search; exact
        results, see ops.distances.knn_sharded)."""
        self.embed_fn = embed_fn
        self.featuresampler = featuresampler or IdentitySampler()
        if nn_method == "exact":
            self.anomaly_scorer = NearestNeighbourScorer(
                anomaly_score_num_nn, mesh=mesh)
        else:
            if mesh is not None:
                raise ValueError(
                    f"mesh sharding is only supported for the exact "
                    f"scorer; nn_method={nn_method!r} runs single-device "
                    f"(drop --dp or use --nn_method exact)")
            from tpu_ac.detect.approx import ApproximateNearestNeighbourScorer

            self.anomaly_scorer = ApproximateNearestNeighbourScorer(
                anomaly_score_num_nn, method=nn_method)
        self.anomaly_segmentor = RescaleSegmentor(target_size)
        self.batch_size = batch_size
        self.config = config or {}

    def _embed_all(self, images: np.ndarray, device: bool = False):
        """Batched embed.  ``device=True`` keeps the [N, P, D] output as a
        device array — fit/predict chain it straight into the sampler /
        kNN search, avoiding a full host round trip of the feature matrix
        (~266 MB for an 83-image MVTec category; ~6 s to re-upload over
        the 45 MB/s tunnel)."""
        import jax.numpy as jnp

        chunks = []
        bs = self.batch_size
        n = images.shape[0]
        pad = (-n) % bs
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
        for i in range(0, images.shape[0], bs):
            z = self.embed_fn(images[i:i + bs])
            chunks.append(z if device else np.asarray(z))
        xp = jnp if device else np
        return xp.concatenate(chunks)[:n]

    @property
    def _device_flow(self) -> bool:
        """Exact scorer consumes device arrays end-to-end; the IVFPQ/
        IVFFlat scorers quantize on the host and want numpy."""
        return isinstance(self.anomaly_scorer, NearestNeighbourScorer)

    def fit(self, training_images: np.ndarray) -> None:
        """_fill_memory_bank (patchcore.py:156-177): embed -> coreset -> index."""
        dev = self._device_flow
        z = self._embed_all(training_images, device=dev)  # [N, P, D]
        bank = z.reshape(-1, z.shape[-1])
        bank = self.featuresampler.run(bank)
        self.anomaly_scorer.fit([bank if dev else np.asarray(bank)])

    def predict(self, images: np.ndarray,
                grid: tuple[int, int] | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
        """(image_scores [B], segmentation_masks [B, H, W])
        (patchcore.py:204-229).

        ``grid``: the (gh, gw) patch grid for non-square feature maps
        (the reference threads (nH, nW) from patchify); defaults to a
        square grid inferred from P, with a clear error otherwise.
        """
        z = self._embed_all(images, device=self._device_flow)  # [B, P, D]
        b, p, d = z.shape
        patch_scores, _, _ = self.anomaly_scorer.predict([z.reshape(-1, d)])
        patch_scores = patch_scores.reshape(b, p)
        image_scores = patch_scores.max(axis=1)  # PatchMaker.score
        if grid is None:
            g = int(math.isqrt(p))
            if g * g != p:
                raise ValueError(
                    f"non-square patch count {p}; pass grid=(gh, gw) for "
                    "rectangular feature maps")
            grid = (g, g)
        masks = self.anomaly_segmentor.convert_to_segmentation(
            patch_scores.reshape(b, *grid))
        return image_scores, masks

    # -- persistence (patchcore.py:235-274) --
    def save_to_path(self, save_path: str, prepend: str = "") -> None:
        os.makedirs(save_path, exist_ok=True)
        self.anomaly_scorer.save(save_path, prepend=prepend)
        with open(os.path.join(save_path,
                               prepend + "patchcore_params.json"), "w") as f:
            json.dump(self.config, f)

    def load_from_path(self, load_path: str, prepend: str = "") -> None:
        self.anomaly_scorer.load(load_path, prepend=prepend)
        params_file = os.path.join(load_path,
                                   prepend + "patchcore_params.json")
        if os.path.exists(params_file):
            with open(params_file) as f:
                self.config = json.load(f)
