"""VMEM-resident whole-run kernel vs the jnp oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, reference, resident
from advanced_hpc_lbm_tpu.params import LBMParams


@pytest.fixture(scope="module")
def deck():
    params = LBMParams(
        nx=128, ny=32, max_iters=17, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(5)
    mask = np.zeros((32, 128), dtype=bool)
    mask[0] = mask[-1] = True
    mask[10:12, 40:60] = True
    for _ in range(4):
        mask[rng.randint(1, 31), rng.randint(0, 128)] = True
    return params, jnp.asarray(mask)


def test_matches_oracle_with_chunking_and_odd_tail(deck):
    """17 steps with chunk=6 exercises: multiple chunks, scan stacking,
    an odd-length tail chunk, and the in-kernel ping-pong."""
    params, obst = deck
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=17)
    fb, avb = resident.resident_run(
        f0, obst, params, n_iters=17, chunk=6, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7)
    # av reduction uses pre-collision moments; at from-rest scales the fp
    # difference is ~1e-4 relative (physically identical, see ops.resident)
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_single_chunk_even(deck):
    params, obst = deck
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=8)
    fb, avb = resident.resident_run(
        f0, obst, params, n_iters=8, chunk=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_too_large_grid_raises():
    params = LBMParams(
        nx=2048, ny=2048, max_iters=2, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    f0 = reference.initial_state(params)
    with pytest.raises(ValueError, match="too large"):
        resident.resident_run(
            f0, jnp.zeros((2048, 2048), bool), params, n_iters=2, interpret=True
        )


def test_supported_covers_reference_decks():
    # every reference deck INCLUDING the 1024^2 headline fits the
    # liveness-lean kernel (two 37.75 MB buffers under the 127 MiB scoped
    # limit); 2048^2 (151 MB/buffer) does not — it uses 'pallask'
    for ny, nx in [(128, 128), (256, 128), (256, 256), (1024, 1024)]:
        assert 9 * ny * nx * 4 <= resident._MAX_BUFFER_BYTES
    assert 9 * 2048 * 2048 * 4 > resident._MAX_BUFFER_BYTES
