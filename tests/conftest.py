"""Test configuration.

Forces JAX onto the host CPU with 8 virtual devices BEFORE jax is imported
anywhere, so (a) the suite is hermetic (no TPU needed), and (b) the sharded
path is exercised on a real 8-way mesh — the honest "multi-node without a
cluster" mechanism for JAX (SURVEY.md section 4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS to the TPU plugin at interpreter start
# (sitecustomize), so the env var is not enough — override via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from advanced_hpc_lbm_tpu.params import LBMParams  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def small_params() -> LBMParams:
    return LBMParams(
        nx=32, ny=16, max_iters=50, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )


@pytest.fixture(scope="session")
def small_obstacles(small_params) -> np.ndarray:
    """A box with a lid opening plus an interior block — hits every
    boundary-interaction case (walls, corners, interior obstacle)."""
    rng = np.random.RandomState(0)
    mask = np.zeros((small_params.ny, small_params.nx), dtype=bool)
    mask[0, :] = True
    mask[-1, :] = True
    mask[:, 0] = True
    mask[5:8, 10:14] = True
    # a few random single-cell obstacles away from the forcing row
    for _ in range(5):
        mask[rng.randint(1, small_params.ny - 3), rng.randint(1, small_params.nx - 1)] = True
    return mask


def reference_deck_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR),
    reason="reference decks not mounted",
)
