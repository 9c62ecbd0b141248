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
        out[k] = v
    return out


def torch_state_dict_to_params(state_dict: Mapping[str, Any]) -> dict[str, jnp.ndarray]:
    """Convert a torch state_dict (tensors or arrays) to a JAX params dict."""
    params = {}
    for k, v in strip_prefixes(state_dict).items():
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

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if checkpoint_key is not None and checkpoint_key in ckpt:
        ckpt = ckpt[checkpoint_key]
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return torch_state_dict_to_params(ckpt)


def params_to_torch_state_dict(params: Mapping[str, jnp.ndarray]):
    """Inverse conversion, for exporting JAX-trained weights to torch users."""
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}
