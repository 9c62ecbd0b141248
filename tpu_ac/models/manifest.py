"""Frozen per-backbone checkpoint manifests: key -> shape inventories.

Eight backbone families (swin, xcit, inception_v4, bninception, resnest,
efficientnet(v2), vit_r50, resnetv2) have no numerical oracle in this
environment — their torch sources live in timm, not the reference tree —
so the strongest available guard is a FROZEN state_dict inventory: for
every registry name, the exact parameter keys and shapes the architecture
expects (generated from the family init_*_params functions, whose key
names mirror the torch state_dicts; see tpu_ac/models/convert.py).

The frozen file (``tpu_ac/models/manifests.json``) makes two failure modes
detectable without any weights:

1. architecture drift — a refactor silently changing a model's parameter
   inventory breaks ``tests/test_manifests.py``;
2. checkpoint mismatch — ``python -m tpu_ac.cli.convert ckpt --backbone X
   --verify`` diffs a real checkpoint against the manifest BEFORE
   conversion, so real-weight day is one command with a precise error
   report instead of a silent partial load.

Regenerate after an intentional architecture change with
``python -m tpu_ac.cli.convert --update_manifests``.
"""

from __future__ import annotations

import json
import os
from typing import Mapping

MANIFEST_PATH = os.path.join(os.path.dirname(__file__), "manifests.json")


def params_inventory(params: Mapping[str, object]) -> dict[str, list[int]]:
    """{key: shape list} for a params dict (sorted keys for stable diffs)."""
    import numpy as np

    return {k: list(np.asarray(v).shape) for k in sorted(params)
            for v in (params[k],)}


def generate_manifest(name: str) -> dict[str, list[int]]:
    """Inventory of one registry name from its random-init architecture."""
    from tpu_ac.models.registry import load_backbone

    params, _, _ = load_backbone(name, use_checkpoint=False)
    return params_inventory(params)


def generate_all(names=None) -> dict[str, dict[str, list[int]]]:
    # default to the BUILT-IN snapshot, not the mutable live registry: a
    # process that register_backbone'd a throwaway spec (tests, notebooks)
    # must not freeze it into manifests.json
    from tpu_ac.models.registry import BUILTIN_BACKBONES

    names = sorted(BUILTIN_BACKBONES) if names is None else names
    return {name: generate_manifest(name) for name in names}


def load_manifests() -> dict[str, dict[str, list[int]]]:
    with open(MANIFEST_PATH) as f:
        return json.load(f)


def save_manifests(manifests: dict) -> None:
    with open(MANIFEST_PATH, "w") as f:
        json.dump(manifests, f, indent=0, sort_keys=True)
        f.write("\n")


def diff_inventory(expected: Mapping[str, list[int]],
                   got: Mapping[str, list[int]]) -> dict[str, list]:
    """missing / unexpected / shape_mismatch of ``got`` vs ``expected``."""
    missing = sorted(k for k in expected if k not in got)
    unexpected = sorted(k for k in got if k not in expected)
    mismatch = sorted(
        (k, list(expected[k]), list(got[k]))
        for k in expected if k in got and list(expected[k]) != list(got[k]))
    return {"missing": missing, "unexpected": unexpected,
            "shape_mismatch": mismatch}


def verify_checkpoint(params: Mapping[str, object], backbone: str
                      ) -> dict[str, list]:
    """Diff a converted checkpoint's inventory against the frozen manifest."""
    manifests = load_manifests()
    if backbone not in manifests:
        raise KeyError(f"no frozen manifest for {backbone!r}; regenerate "
                       "with --update_manifests")
    return diff_inventory(manifests[backbone], params_inventory(params))
