"""Two-process DCN smoke test: multihost_init actually executes
jax.distributed.initialize against a local coordinator and a cross-process
psum runs (the reference's NCCL init path, dino-main/utils.py:467-499).

Each child is a fresh CPU-only process (JAX_PLATFORMS=cpu before any jax
import); rank 0 hosts the coordinator on a free localhost port.  Skipped
(not failed) on timeout — distributed init can hang on constrained CI
sandboxes — but any rank asserting a wrong psum result fails hard.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")

from tpu_ac.distributed.mesh import multihost_init

rank = int(sys.argv[1])
coord = sys.argv[2]
multihost_init(coordinator_address=coord, num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank

import jax.numpy as jnp
from jax.experimental import multihost_utils

# cross-process reduction over the 2-process "DCN": each process
# contributes (rank + 1); the global sum must be 3 on BOTH ranks
val = multihost_utils.process_allgather(jnp.float32(rank + 1.0))
total = float(val.sum())
assert total == 3.0, total
print(f"rank {rank} ok total={total}", flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(180)
def test_two_process_dcn_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p])
    procs = [
        subprocess.Popen([sys.executable, "-c", _CHILD, str(rank), coord],
                         env=env, cwd=repo, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            try:
                out, _ = p.communicate(timeout=120)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.skip("distributed init timed out in this sandbox")
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (rc, out) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} ok total=3.0" in out, out
