"""Device mesh helpers and sharded alpha computation.

Replaces the reference's distributed runtime (SURVEY.md L5):
``init_distributed_mode`` + NCCL process groups (dino-main/utils.py:467-499)
become ``jax.distributed.initialize`` (multi-host, DCN) + a single
``jax.sharding.Mesh`` whose collectives ride ICI.

The alpha weights are the only stage needing cross-device data exchange:
each device owns N/dp test images, all-gathers the full patch-embedding
bank once (tiled over ICI), and computes min-distance rows for its local
images with the Pallas kernel — an embarrassingly-parallel O(N^2 P^2 D)
workload split N-ways with one collective.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def get_mesh(n_devices: int | None = None,
             axis_name: str = "dp") -> Mesh:
    """A 1-D data-parallel mesh over the first n devices.

    Raises when fewer than ``n_devices`` are available — a silently
    truncated mesh would run (and AOT-export) a different topology than
    the one requested.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available (for a CPU dry run "
                f"set XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices})")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def dp_mesh(dp: int, batch_size: int | None = None,
            flag: str = "--dp") -> Mesh:
    """CLI helper: a dp-device mesh, validating batch divisibility first
    (the shared setup of the ``--dp`` eval/detect entry points)."""
    if batch_size is not None and batch_size % dp:
        raise ValueError(
            f"batch size {batch_size} not divisible by {flag} {dp}")
    return get_mesh(dp)


def shard_batch(mesh: Mesh, array, axis_name: str = "dp"):
    """Shard the leading (batch) axis over the mesh, zero-padding to a
    multiple of the axis size.  Returns (sharded_array, n_valid)."""
    n = array.shape[0]
    size = mesh.shape[axis_name]
    pad = (-n) % size
    if pad:
        array = np.concatenate(
            [np.asarray(array),
             np.zeros((pad, *array.shape[1:]), dtype=array.dtype)])
    sharded = jax.device_put(array, NamedSharding(mesh, P(axis_name)))
    return sharded, n


def _per_image_weights(z_local: jnp.ndarray, bank: jnp.ndarray,
                       reduce_mode: str, n_valid,
                       precision: str = "f32") -> jnp.ndarray:
    from tpu_ac.kernels.distances import min_dists_all_pairs

    n_bank = bank.shape[0]
    # n_valid may be a TRACED scalar (the AOT serving export keeps it an
    # argument so one artifact serves every category size); jnp ops
    # constant-fold when it is a Python int, so the eager path is unchanged
    valid = (jnp.arange(n_bank) < n_valid)[None, :, None]  # padded bank rows

    mins = min_dists_all_pairs(z_local, bank,
                               precision=precision)  # [N_local, N_bank, P]
    if reduce_mode == "mean":
        mins = jnp.where(valid, mins, 0.0)
        # clamp: nv=1 would be 0/0 NaN (pipeline raises before dispatch)
        return jnp.sum(mins, axis=1) / jnp.maximum(n_valid - 1, 1)
    mins = jnp.where(valid, mins, jnp.inf)
    return jnp.min(mins, axis=1)


def triangle_weights_local(z_local: jnp.ndarray, axis_name: str, n_valid,
                           precision: str = "f32") -> jnp.ndarray:
    """Inside-shard_map body: the triangle-aware unsupervised weight sweep.

    The unsupervised distance matrix is symmetric at the TILE level
    (mins[a, b] and mins[b, a] are the row- and col-mins of the same
    [P, Q] tile), so the rectangular local-rows x full-bank sweep does 2x
    the needed MXU work.  This body instead has each device compute a
    CIRCULANT WINDOW of the gathered bank: device d owns contiguous global
    rows a = d*L + r and sweeps columns b = (d*L + 1 + w) mod N_pad for
    w < L - 1 + H, H = N_pad // 2, with the kernel predicated on pair
    distance k = w - r + 1 in [1, H] — exactly N_pad^2/(2*dp) active tiles
    per device (perfectly balanced; every unordered pair covered once, the
    k == H pair of an even N_pad de-duplicated by the a < b tie-break).
    Each tile's row-min contributes to W[a] and col-min to W[b]; the
    partial sums meet in ONE [N_pad, P] f32 psum (~N*P*4 bytes of ICI
    traffic — at MVTec scale ~0.6 MB vs the ~2x compute saved).

    ``n_valid`` may be a Python int or a traced scalar (the AOT sharded
    export keeps it an argument).  Returns this device's W rows [L, P].
    """
    from tpu_ac.kernels.distances import min_dists_window

    n_local, p, _ = z_local.shape
    bank = jax.lax.all_gather(z_local, axis_name, axis=0, tiled=True)
    n_pad = bank.shape[0]
    h = n_pad // 2
    w_win = n_local - 1 + h
    d = jax.lax.axis_index(axis_name)
    start = d * n_local + 1
    bank_w = jnp.roll(bank, -start, axis=0)[:w_win]

    row_mins, col_mins = min_dists_window(z_local, bank_w, window=h,
                                          precision=precision)
    r = jnp.arange(n_local)[:, None]
    w = jnp.arange(w_win)[None, :]
    k = w - r + 1  # pair distance (b - a) mod n_pad
    a_glob = d * n_local + jnp.arange(n_local)
    b_glob = (start + jnp.arange(w_win)) % n_pad
    ok = (k >= 1) & (k <= h)
    if n_pad % 2 == 0:
        # the k == H pair is swept from BOTH endpoints; keep the a < b copy
        ok &= (k < h) | (a_glob[:, None] < b_glob[None, :])
    ok &= (a_glob[:, None] < n_valid) & (b_glob[None, :] < n_valid)

    row_part = jnp.sum(jnp.where(ok[:, :, None], row_mins, 0.0), axis=1)
    col_part = jnp.sum(jnp.where(ok.T[:, :, None], col_mins, 0.0), axis=1)
    partial = jnp.zeros((n_pad, p), jnp.float32)
    partial = jax.lax.dynamic_update_slice(partial, row_part,
                                           (d * n_local, 0))
    partial = partial + jnp.roll(
        jnp.pad(col_part, ((0, n_pad - w_win), (0, 0))), start, axis=0)
    total = jax.lax.psum(partial, axis_name)
    wdist = total / jnp.maximum(n_valid - 1, 1)
    return jax.lax.dynamic_slice_in_dim(wdist, d * n_local, n_local, axis=0)


def sharded_weight_distance_unsupervised(mesh: Mesh, Z_sharded: jnp.ndarray,
                                         n_valid: int,
                                         axis_name: str = "dp",
                                         precision: str = "f32",
                                         scheme: str = "triangle"
                                         ) -> jnp.ndarray:
    """Weight_Distance_Unsupervised with the image set sharded over dp.

    Z_sharded: [N_pad, P, D], leading axis sharded; ``n_valid`` real images
    (zero-padding rows beyond it are masked out of the bank sums, and their
    own output rows are garbage the caller slices off).
    Returns W [N_pad, P], sharded like the input.

    ``scheme``: "triangle" (default) exploits the tile-level symmetry of
    the all-pairs sweep — each device computes a balanced circulant window
    of ~half the tiles and the partials meet in one small [N, P] psum
    (see :func:`triangle_weights_local`); "rect" is the plain local-rows x
    full-bank sweep (2x the MXU work, no output collective).
    """
    if scheme not in ("triangle", "rect"):
        raise ValueError(f"scheme {scheme!r}; want 'triangle' or 'rect'")
    if scheme == "triangle" and mesh.shape[axis_name] == 1:
        scheme = "rect"  # window width would exceed the bank; rect is exact

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(axis_name), out_specs=P(axis_name),
                       check_rep=False)
    def f(z_local):
        if scheme == "triangle":
            return triangle_weights_local(z_local, axis_name, n_valid,
                                          precision)
        bank = jax.lax.all_gather(z_local, axis_name, axis=0, tiled=True)
        return _per_image_weights(z_local, bank, "mean", n_valid, precision)

    return f(Z_sharded)


def sharded_weight_distance_supervised(mesh: Mesh, Z_sharded: jnp.ndarray,
                                       Z_train: jnp.ndarray,
                                       axis_name: str = "dp",
                                       precision: str = "f32") -> jnp.ndarray:
    """Supervised variant: test images sharded over dp, train bank
    replicated (it is read-only and typically small)."""
    n_train = Z_train.shape[0]

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis_name), P()), out_specs=P(axis_name),
                       check_rep=False)
    def f(z_local, bank):
        return _per_image_weights(z_local, bank, "min", n_train, precision)

    return f(Z_sharded, Z_train)


def multihost_init(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Multi-host (DCN) initialization — init_distributed_mode equivalent.

    On single-host TPU slices this is a no-op; on multi-host pods call it
    once per host before any jax op (jax.distributed.initialize picks up
    cluster env vars when args are None).
    """
    import os

    if num_processes is not None and num_processes <= 1:
        return
    if (coordinator_address is None and num_processes is None
            and process_id is None
            and not any(os.environ.get(v) for v in (
                "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "SLURM_JOB_NUM_NODES", "CLOUD_TPU_TASK_ID",
                "TPU_WORKER_HOSTNAMES"))):
        # bare single-host call (no explicit topology, no cluster env):
        # honor the documented no-op instead of letting
        # jax.distributed.initialize raise/hang waiting for a coordinator
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
