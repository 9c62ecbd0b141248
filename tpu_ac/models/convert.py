"""torch checkpoint -> JAX params conversion.

Param keys in tpu_ac.models mirror the torch state_dict names of the
released DINO checkpoints (backbones.py:53-79 downloads them from torch.hub;
dino-main/utils.py:71-109 strips ``module.``/``backbone.`` prefixes), so
conversion is a mechanical array copy.  torch is only imported lazily and
only on the host — it is a serialization dependency, never a compute one.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def strip_prefixes(state_dict: Mapping[str, Any],
                   prefixes: tuple[str, ...] = ("module.", "backbone.")) -> dict[str, Any]:
    """Remove DDP / MultiCropWrapper prefixes (dino-main/utils.py:103-105)."""
    out = {}
    for k, v in state_dict.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        if k in out:
            import logging

            logging.getLogger(__name__).warning(
                "prefix-stripped key collision: %r — the later entry wins "
                "(checkpoint holds e.g. both 'module.%s' and '%s')",
                k, k, k)
        out[k] = v
    return out


def torch_state_dict_to_params(state_dict: Mapping[str, Any]) -> dict[str, jnp.ndarray]:
    """Convert a torch state_dict (tensors or arrays) to a JAX params dict.

    ``num_batches_tracked`` BN bookkeeping counters are dropped — no
    forward consumes them (torch's own momentum-based BN ignores them at
    inference) and every torchvision BN checkpoint carries them, so
    keeping them would make all such checkpoints fail manifest
    verification spuriously."""
    params = {}
    for k, v in strip_prefixes(state_dict).items():
        if k.endswith("num_batches_tracked"):
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        params[k] = jnp.asarray(np.asarray(v))
    return params


def load_torch_checkpoint(path: str, checkpoint_key: str | None = None) -> dict[str, jnp.ndarray]:
    """Load a .pth checkpoint from disk and convert to JAX params.

    checkpoint_key selects a sub-dict (e.g. "teacher"/"student" for full DINO
    training checkpoints, cf. dino-main/utils.py:84-92).
    """
    import torch  # host-side only

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # full training checkpoints (the very case checkpoint_key exists
        # for) carry non-tensor entries — argparse Namespaces, loss
        # modules — that weights_only refuses to unpickle; fall back like
        # the reference's own torch.load (dino-main/utils.py:84)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if checkpoint_key is not None and checkpoint_key in ckpt:
        ckpt = ckpt[checkpoint_key]
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if any(".denselayer" in k for k in ckpt):
        ckpt = remap_densenet_keys(ckpt)
    return torch_state_dict_to_params(ckpt)


def validate_params_against_backbone(params: Mapping[str, Any],
                                     name: str) -> dict:
    """Key-coverage report of converted params vs a registry backbone's
    expected structure — the conversion sanity check a reference user runs
    when migrating released .pth files.

    Returns {"missing": [...], "unexpected": [...], "shape_mismatch": [...]}.
    """
    from tpu_ac.models.manifest import diff_inventory, params_inventory
    from tpu_ac.models.registry import load_backbone

    # use_checkpoint=False: the expected structure must come from the
    # architecture's own init, NOT from whatever checkpoint is cached —
    # otherwise the report compares the checkpoint against itself and is
    # vacuously clean
    expected, _cfg, _family = load_backbone(name, use_checkpoint=False)
    report = diff_inventory(params_inventory(expected),
                            params_inventory(params))
    # diff_inventory reports shape_mismatch as (key, expected, got)
    # triples; this report's contract is bare keys
    report["shape_mismatch"] = [k for k, *_ in report["shape_mismatch"]]
    return report


def params_to_torch_state_dict(params: Mapping[str, jnp.ndarray]):
    """Inverse conversion, for exporting JAX-trained weights to torch users."""
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}


def moco_to_contrastive_params(state_dict) -> dict[str, jnp.ndarray]:
    """Remap an official MoCo-v2 checkpoint to ContrastiveModel param names.

    The reference downloads moco_v2_800ep_pretrain.pth.tar and renames
    ``module.encoder_q.*`` -> backbone / contrastive_head keys
    (Unsupervised-Classification-master/moco.py:64-88).  Same mapping here;
    fc.0/fc.2 of the query encoder become contrastive_head.0/.2.
    """
    import numpy as np

    out: dict[str, jnp.ndarray] = {}
    for k, v in state_dict.items():
        if not k.startswith("module.encoder_q."):
            continue
        name = k[len("module.encoder_q."):]
        if name.startswith("fc."):
            name = "contrastive_head." + name[len("fc."):]
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                         else v)
        out[name] = jnp.asarray(arr)
    return out


def remap_densenet_keys(state_dict) -> dict:
    """torchvision DenseNet checkpoints use legacy dotted norm/conv names
    (norm.1 -> norm1 etc.); apply the same regex remap torchvision's
    load function does before using the params."""
    import re

    pattern = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|"
        r"running_mean|running_var))$")
    out = {}
    for k, v in state_dict.items():
        m = pattern.match(k)
        if m:
            k = m.group(1) + m.group(2).replace(".", "")
            # norm.1.weight -> norm1.weight (digit folds into the module)
            k = re.sub(r"(norm|conv)(\d)(weight|bias|running_mean|running_var)",
                       r"\1\2.\3", k)
        out[k] = v
    return out
