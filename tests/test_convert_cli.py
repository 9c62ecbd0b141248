"""Checkpoint-conversion CLI end-to-end: the real-weight migration path.

Simulates what a reference user does on real-weight day: a torch .pth in
the wild shape (DDP ``module.`` prefixes, BN ``num_batches_tracked``
buffers, extra unused heads, wrapped in a full training checkpoint with
non-tensor entries under a sub-dict key), run through
``python -m tpu_ac.cli.convert --verify --install`` and loaded back via
the registry.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pytest


NAME = "resnet18"


@pytest.fixture(scope="module")
def wild_checkpoint(tmp_path_factory):
    """A full-training-checkpoint .pth for resnet18 in the wild shape."""
    import torch

    from tpu_ac.models.registry import load_backbone

    params, _, _ = load_backbone(NAME, use_checkpoint=False)
    sd = {}
    for k, v in params.items():
        sd["module." + k] = torch.from_numpy(np.asarray(v))
        if k.endswith(".running_var"):
            sd["module." + k.replace(".running_var", ".num_batches_tracked")] \
                = torch.tensor(100)
    sd["module.fc_extra.weight"] = torch.zeros(10, 4)  # unused extra head
    ckpt = {"teacher": sd, "epoch": 3,
            "args": argparse.Namespace(lr=0.1)}  # defeats weights_only=True
    path = tmp_path_factory.mktemp("ckpt") / "full_training_ckpt.pth"
    torch.save(ckpt, str(path))
    return str(path)


class TestConvertCLI:
    def test_verify_install_load_roundtrip(self, wild_checkpoint, tmp_path):
        """--verify must PASS despite prefixes/BN buffers/extra heads
        (missing/misshaped fail; merely-unused tensors warn), --install
        must write the converted flat state_dict, and load_backbone must
        load it bit-exactly."""
        import torch

        from tpu_ac.cli.convert import main
        from tpu_ac.models.registry import BACKBONE_CONFIGS, load_backbone

        cache = str(tmp_path / "cache")
        report = main([wild_checkpoint, "--backbone", NAME,
                       "--checkpoint_key", "teacher", "--verify",
                       "--install", "--cache_dir", cache])
        assert not report["missing"] and not report["shape_mismatch"]
        dest = os.path.join(cache, BACKBONE_CONFIGS[NAME].checkpoint)
        assert os.path.exists(dest)
        # the installed artifact is the converted FLAT dict (teacher
        # selected, prefixes stripped, BN counters dropped) — not a copy
        # of the raw training checkpoint
        flat = torch.load(dest, map_location="cpu", weights_only=True)
        assert "conv1.weight" in flat and "teacher" not in flat
        assert not any(k.endswith("num_batches_tracked") for k in flat)

        loaded, _, _ = load_backbone(NAME, checkpoint_dir=cache)
        want, _, _ = load_backbone(NAME, use_checkpoint=False)
        np.testing.assert_array_equal(np.asarray(loaded["conv1.weight"]),
                                      np.asarray(want["conv1.weight"]))

    def test_install_refuses_mismatched_checkpoint(self, wild_checkpoint,
                                                   tmp_path):
        """A checkpoint that does not cover the backbone must NOT be
        installed into the cache."""
        from tpu_ac.cli.convert import main
        from tpu_ac.models.registry import BACKBONE_CONFIGS

        cache = str(tmp_path / "cache2")
        with pytest.raises(SystemExit):
            main([wild_checkpoint, "--backbone", "resnet34",
                  "--checkpoint_key", "teacher", "--install",
                  "--cache_dir", cache])
        dest = os.path.join(cache, BACKBONE_CONFIGS["resnet34"].checkpoint)
        assert not os.path.exists(dest)
