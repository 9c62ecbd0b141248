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
    # npz can't represent ml_dtypes (bfloat16 silently round-trips as raw
    # '|V2' bytes) — store such leaves as a bit-identical uint view and
    # record the true dtype name in the metadata for restore
    arrays, dtypes = {}, []
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        dtypes.append(a.dtype.name)
        if a.dtype.kind == "V" or not a.dtype.isbuiltin:
            a = a.view(np.dtype(f"u{a.dtype.itemsize}"))
        arrays[f"leaf_{i}"] = a
    np.savez(os.path.join(tmp, "arrays.npz"), **arrays)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"step": step, "n_leaves": len(leaves),
                   "dtypes": dtypes, "extra": extra or {}}, f)
    if os.path.exists(path):
        # same-step overwrite: park the old good checkpoint aside FIRST
        # (atomic rename) so a preemption between steps never leaves the
        # path with neither the old nor the new data recoverable
        prev = path + ".prev"
        if os.path.exists(prev):
            shutil.rmtree(prev)
        os.rename(path, prev)
        os.rename(tmp, path)
        shutil.rmtree(prev)
    else:
        os.rename(tmp, path)
    if keep is not None:
        ckpts = sorted(_list_checkpoints(directory, name))
        for _step, old in ckpts[:-keep]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def _list_checkpoints(directory: str, name: str) -> list[tuple[int, str]]:
    if not os.path.isdir(directory):
        return []
    pat = re.compile(rf"^{re.escape(name)}-(\d+)(\.prev)?$")
    bare: dict[int, str] = {}
    prev: dict[int, str] = {}
    for entry in os.listdir(directory):
        m = pat.match(entry)
        if m:
            dst = prev if m.group(2) else bare
            dst[int(m.group(1))] = os.path.join(directory, entry)
    # '.prev' is the old copy parked aside during a same-step overwrite;
    # it only counts when the overwrite was interrupted before the new
    # directory landed (bare entry wins otherwise)
    return sorted({**prev, **bare}.items())


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
    dtypes = meta.get("dtypes")  # absent in pre-dtype-record checkpoints
    restored = []
    for i, tmpl in enumerate(leaves):
        a = data[f"leaf_{i}"]
        if dtypes is not None:
            true_dtype = np.dtype(dtypes[i])
            if a.dtype != true_dtype:  # stored as a uint bit-view
                a = a.view(true_dtype)
        shape = np.shape(tmpl)
        if shape != a.shape:
            raise ValueError(
                f"checkpoint leaf {i} has shape {a.shape}, template "
                f"expects {shape} — structure mismatch")
        restored.append(a)
    state = jax.tree.unflatten(treedef, restored)
    return state, meta
