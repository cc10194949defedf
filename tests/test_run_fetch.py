"""Simulation.run(fetch=...) / SimulationResult.collate() semantics.

The CLI relies on fetch=False + collate() for its Compute/Collate timer
split (the reference's d2q9-bgk.c:177-213 phase contract); these tests pin
the API: device-resident results, idempotent collation, deferred finite
checks, and value equality with the default fetch=True path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.models.d2q9_bgk import Simulation, SimulationResult
from advanced_hpc_lbm_tpu.params import LBMParams


@pytest.fixture(scope="module")
def sim():
    params = LBMParams(
        nx=32, ny=24, max_iters=20, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    return Simulation(params, mask, backend="fused")


def test_fetch_false_defers_transfer_and_collate_converts(sim):
    res = sim.run(fetch=False)
    assert isinstance(res.f_final, jax.Array)
    assert isinstance(res.av_vels, jax.Array)
    res.collate()
    assert isinstance(res.f_final, np.ndarray)
    assert isinstance(res.av_vels, np.ndarray)
    # idempotent
    res.collate()
    assert isinstance(res.f_final, np.ndarray)


def test_fetch_false_matches_fetch_true(sim):
    a = sim.run(fetch=False).collate()
    b = sim.run()  # fetch=True default
    np.testing.assert_array_equal(a.av_vels, b.av_vels)
    np.testing.assert_array_equal(a.f_final, b.f_final)
    assert a.reynolds == b.reynolds


def test_deferred_check_finite_raises_at_collate(sim):
    res = SimulationResult(
        params=sim.params,
        f_final=jnp.full((9, sim.params.ny, sim.params.nx), jnp.nan),
        av_vels=jnp.zeros((4,), jnp.float32),
    )
    res._obstacles_cache = sim.obstacles
    res._check_finite_pending = True
    with pytest.raises(FloatingPointError):
        res.collate()


def test_check_finite_with_fetch_false_passes_on_healthy_run(sim):
    res = sim.run(fetch=False, check_finite=True)
    assert getattr(res, "_check_finite_pending", False)
    res.collate()  # must not raise
    assert not res._check_finite_pending
