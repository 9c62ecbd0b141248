"""Checkpoint / resume — the restart_from_checkpoint equivalent.

The reference has three checkpoint flavors (SURVEY.md section 5): DINO's
multi-module .pth with epoch counter (dino-main/utils.py:152-184), SCAN's
per-stage .pth.tar, and PatchCore's pickle+faiss persistence.  Here every
train state is a pytree of arrays, so one mechanism covers all of them:
orbax-backed save/restore of the pytree plus a JSON sidecar of scalars
(epoch, step, config digest).  Writes go through a temp dir + atomic
rename so a preempted job never sees a torn checkpoint (the SLURM-requeue
resume path, run_with_submitit.py:58-75).
"""

from __future__ import annotations

import json
import os
import re
import shutil

import jax
import numpy as np


def save_checkpoint(directory: str, name: str, state, *, step: int = 0,
                    extra: dict | None = None, keep: int | None = None
                    ) -> str:
    """Save a pytree state atomically as ``<directory>/<name>-<step>``.

    Arrays go into one .npz (leaf order = treedef order); metadata (step,
    user extras) into meta.json.  Returns the checkpoint path.
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}-{step:08d}")
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    leaves, _ = jax.tree.flatten(state)
    np.savez(os.path.join(tmp, "arrays.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"step": step, "n_leaves": len(leaves),
                   "extra": extra or {}}, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    if keep is not None:
        ckpts = sorted(_list_checkpoints(directory, name))
        for _step, old in ckpts[:-keep]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def _list_checkpoints(directory: str, name: str) -> list[tuple[int, str]]:
    out = []
    if not os.path.isdir(directory):
        return out
    pat = re.compile(rf"^{re.escape(name)}-(\d+)$")
    for entry in os.listdir(directory):
        m = pat.match(entry)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, entry)))
    return sorted(out)


def latest_checkpoint(directory: str, name: str) -> str | None:
    """Most recent checkpoint path, or None (resume-if-exists semantics,
    dino-main/main_dino.py:254-265)."""
    ckpts = _list_checkpoints(directory, name)
    return ckpts[-1][1] if ckpts else None


def restore_checkpoint(path: str, template):
    """Restore a pytree saved by ``save_checkpoint`` into the structure of
    ``template``.  Returns (state, meta_dict)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "arrays.npz"))
    leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != meta["n_leaves"]:
        raise ValueError(
            f"checkpoint has {meta['n_leaves']} leaves, template has "
            f"{len(leaves)} — structure mismatch")
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    state = jax.tree.unflatten(treedef, restored)
    return state, meta
