"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
against 8 virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).  The env vars must be
set before jax initializes a backend, hence this top-of-conftest block.
"""

import os

# Force CPU: the ambient environment may set JAX_PLATFORMS=axon (the real
# TPU tunnel), which is both slow for unit tests and runs matmuls in bf16,
# breaking fp32 parity tolerances.  The sitecustomize of that environment
# imports jax at interpreter start, so the env var alone is captured too
# early — override via jax.config as well (works as long as no backend has
# been initialized yet, which holds at conftest import time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
GOLDEN_ROOT = os.path.join(
    REFERENCE_ROOT, "Anomaly-Clustering/outputs/mvtec_ad"
)


def has_goldens() -> bool:
    return os.path.isdir(GOLDEN_ROOT)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2023)
