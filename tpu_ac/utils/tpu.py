"""TPU backend bring-up helper for the axon-tunneled single-chip setup.

The tunnel's tile claim is exclusive per process and takes a variable
amount of time (tens of seconds to minutes) to release after a process
exits.  During that window the PJRT registration in sitecustomize fails
silently and ``jax.devices()`` raises "Backend 'axon' is not in the list
of known backends".  ``ensure_backend`` retries registration + device
discovery until the claim frees up, then enables the persistent
compilation cache (remote compiles are minutes per program; cached reruns
are milliseconds).
"""

from __future__ import annotations

import os
import sys
import time


def ensure_backend(max_attempts: int = 12, sleep_s: float = 30.0,
                   compilation_cache: str | None = "~/.cache/jax_compilation",
                   verbose: bool = True):
    """Return jax with a live backend, retrying transient claim failures.

    (VMEM scratch ceilings for the Pallas kernels are raised per-kernel via
    ``pltpu.CompilerParams(vmem_limit_bytes=...)`` — do NOT put
    ``--xla_tpu_scoped_vmem_limit_kib`` in XLA_FLAGS: the local CPU XLA
    parser aborts on unknown TPU flags.)
    """
    import jax

    if compilation_cache:
        cache = os.path.expanduser(compilation_cache)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    last_err: Exception | None = None
    for attempt in range(max_attempts):
        try:
            jax.devices()
            return jax
        except RuntimeError as e:
            last_err = e
            if verbose:
                print(f"[tpu] backend init attempt {attempt + 1}/"
                      f"{max_attempts} failed: {str(e)[:120]}",
                      file=sys.stderr)
            if attempt + 1 == max_attempts:
                break  # don't pay a sleep+reregister that's never probed
            time.sleep(sleep_s)
            _try_reregister(verbose)
    raise RuntimeError(
        f"TPU backend unavailable after {max_attempts} attempts") from last_err


def _try_reregister(verbose: bool) -> None:
    """Re-attempt the axon PJRT registration that sitecustomize may have
    failed (and swallowed) at interpreter start."""
    try:
        import uuid

        from axon.register import register

        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        register(None, f"{gen}:1x1x1",
                 so_path="/opt/axon/libaxon_pjrt.so",
                 session_id=str(uuid.uuid4()),
                 remote_compile=os.environ.get(
                     "PALLAS_AXON_REMOTE_COMPILE") == "1")
    except Exception as e:  # noqa: BLE001 — "already registered" is fine
        if verbose and "already registered" not in str(e):
            print(f"[tpu] re-register: {str(e)[:120]}", file=sys.stderr)
