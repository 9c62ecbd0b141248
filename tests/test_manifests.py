"""Frozen checkpoint-manifest guards (tpu_ac/models/manifests.json).

The eight backbone families with no numerical oracle in this environment
(swin, xcit, inception_v4, bninception, resnest, efficientnet(v2),
vit_r50, resnetv2 — their torch sources live in timm, outside the
reference tree) are guarded by a frozen state_dict key+shape inventory:
silent architecture drift breaks these tests, and a real checkpoint is
diffed against the same inventory by ``cli/convert.py --verify`` before
conversion.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpu_ac.models import manifest
from tpu_ac.models.registry import BUILTIN_BACKBONES

# one (small) representative per ORACLE-LESS family, plus the flagship ViT
# — regenerating every registry entry costs ~7 min, these ~1 min
REPRESENTATIVES = (
    "swin_tiny",              # swin
    "dino_xcit_small_12_p16",  # xcit
    "inception_v4",           # inception_v4
    "bninception",            # bninception
    "resnest50",              # resnest
    "efficientnet_b1",        # efficientnet
    "mnasnet_100",            # mnasnet (same timm layout conventions)
    "vit_r50",                # vit_hybrid
    "resnetv2_50_bit",        # resnetv2
    "dino_vitbase8",          # flagship (oracle-covered; cheap canary)
)


@pytest.fixture(scope="module")
def frozen():
    return manifest.load_manifests()


def test_manifest_covers_every_registry_name(frozen):
    # BUILTIN_BACKBONES, not BACKBONE_CONFIGS: other tests register tiny
    # throwaway architectures at runtime, which by definition have no
    # frozen manifest
    missing = sorted(BUILTIN_BACKBONES - set(frozen))
    assert not missing, (
        f"no frozen manifest for {missing}; run "
        "python -m tpu_ac.cli.convert --update_manifests")


def test_manifest_entries_are_wellformed(frozen):
    for name, inv in frozen.items():
        assert inv, f"{name}: empty manifest"
        for key, shape in inv.items():
            assert isinstance(key, str) and isinstance(shape, list), (name, key)
            assert all(isinstance(d, int) and d > 0 for d in shape), (
                name, key, shape)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_architecture_matches_frozen_manifest(frozen, name):
    """Regenerate the inventory from the live architecture and diff it
    against the frozen file — catches silent param-inventory drift."""
    got = manifest.generate_manifest(name)
    diff = manifest.diff_inventory(frozen[name], got)
    assert diff == {"missing": [], "unexpected": [], "shape_mismatch": []}, (
        f"{name} drifted from manifests.json: {diff} — if intentional, "
        f"run python -m tpu_ac.cli.convert --update_manifests {name}")


def test_verify_checkpoint_detects_mismatches(frozen):
    """verify_checkpoint flags missing / unexpected / misshaped tensors."""
    name = "dino_vitbase8"
    inv = frozen[name]
    fake = {k: np.zeros(shape, np.float32) for k, shape in inv.items()}
    report = manifest.verify_checkpoint(fake, name)
    assert report == {"missing": [], "unexpected": [], "shape_mismatch": []}

    some_key = next(iter(inv))
    broken = dict(fake)
    broken.pop(some_key)
    broken["bogus.weight"] = np.zeros((3,), np.float32)
    first_shaped = next(k for k, s in inv.items() if s and k in broken)
    broken[first_shaped] = np.zeros(
        [d + 1 for d in inv[first_shaped]], np.float32)
    report = manifest.verify_checkpoint(broken, name)
    assert some_key in report["missing"]
    assert "bogus.weight" in report["unexpected"]
    assert any(k == first_shaped for k, _, _ in report["shape_mismatch"])
