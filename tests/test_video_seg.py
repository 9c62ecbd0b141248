"""Video-segmentation label propagation invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ac.train.video_seg import (
    norm_mask,
    propagate_labels,
    propagate_video,
    restrict_neighborhood,
    to_one_hot,
)


class TestPropagation:
    def test_identity_context_recovers_mask(self, rng):
        """If the target features equal a context frame's, the propagated
        mask matches that frame's mask (sharp affinities)."""
        h = w = 4
        d = 16
        feats = rng.standard_normal((h * w, d)).astype(np.float32) * 5
        labels = rng.integers(0, 3, (h, w))
        mask = to_one_hot(labels, 3)
        out = propagate_labels(
            jnp.asarray(feats), jnp.asarray(feats[None]),
            jnp.asarray(mask[None]), grid=(h, w), topk=1,
            size_mask_neighborhood=0)
        got = np.asarray(out).argmax(0)
        np.testing.assert_array_equal(got, labels)

    def test_affinities_normalized(self, rng):
        h = w = 4
        feats = rng.standard_normal((h * w, 8)).astype(np.float32)
        ctx = rng.standard_normal((2, h * w, 8)).astype(np.float32)
        segs = rng.uniform(size=(2, 3, h, w)).astype(np.float32)
        # make each context mask sum to 1 per pixel -> output also does
        segs = segs / segs.sum(axis=1, keepdims=True)
        out = np.asarray(propagate_labels(
            jnp.asarray(feats), jnp.asarray(ctx), jnp.asarray(segs),
            grid=(h, w), topk=3, size_mask_neighborhood=0))
        np.testing.assert_allclose(out.sum(0), 1.0, rtol=1e-4)

    def test_neighborhood_mask(self):
        m = restrict_neighborhood(4, 4, size=1)
        assert m.shape == (16, 16)
        # corner pixel attends to its 2x2 neighborhood only
        assert m[0].sum() == 4
        # center pixel attends to 3x3
        center = 1 * 4 + 1
        assert m[center].sum() == 9

    def test_propagate_video_queue(self, rng):
        h = w = 4
        frames = [rng.standard_normal((h * w, 8)).astype(np.float32)
                  for _ in range(4)]
        mask = to_one_hot(rng.integers(0, 2, (h, w)), 2)
        outs = propagate_video(frames, mask, (h, w), n_last_frames=2,
                               topk=2, size_mask_neighborhood=0)
        assert len(outs) == 4
        assert all(o.shape == (2, h, w) for o in outs)

    def test_norm_mask(self):
        m = np.array([[[0.0, 2.0], [4.0, 6.0]], [[0.0, 0.0], [0.0, 0.0]]])
        out = norm_mask(m)
        assert out[0].max() == 1.0 and out[0].min() == 0.0
        np.testing.assert_array_equal(out[1], 0.0)


class TestLauncher:
    def test_requeue_until_success(self):
        from tpu_ac.distributed.launch import LaunchConfig, run_with_requeue

        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("preempted")
            return "done"

        out = run_with_requeue(flaky, LaunchConfig(max_restarts=5,
                                                   restart_delay_s=0.0))
        assert out == "done" and calls["n"] == 3

    def test_gives_up_after_max_restarts(self):
        from tpu_ac.distributed.launch import LaunchConfig, run_with_requeue

        def always_fails():
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="after 2 restarts"):
            run_with_requeue(always_fails,
                             LaunchConfig(max_restarts=2, restart_delay_s=0.0))


class TestMocoTransfer:
    def test_remaps_encoder_q(self):
        import torch
        from tpu_ac.models.convert import moco_to_contrastive_params

        sd = {
            "module.encoder_q.conv1.weight": torch.ones(4, 3, 3, 3),
            "module.encoder_q.fc.0.weight": torch.ones(8, 4),
            "module.encoder_q.fc.2.weight": torch.ones(2, 8),
            "module.encoder_k.conv1.weight": torch.zeros(4, 3, 3, 3),
            "queue": torch.zeros(8, 100),
        }
        out = moco_to_contrastive_params(sd)
        assert set(out) == {"conv1.weight", "contrastive_head.0.weight",
                            "contrastive_head.2.weight"}
