"""Two-steps-per-pass kernel vs the jnp oracle (interpret mode on CPU).

The overlapped-window tiling recomputes seam rows; these tests cover the
cases where that goes wrong: tile boundaries, the periodic wrap, the
forcing row seen through both windows, and odd iteration counts (which
exercise the 1-step tail)."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, pallas_multi, reference
from advanced_hpc_lbm_tpu.params import LBMParams


def make_case(ny, nx, seed=1):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=4, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(seed)
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[ny // 2 : ny // 2 + 2, nx // 3 : nx // 2] = True
    for _ in range(6):
        mask[rng.randint(1, ny - 1), rng.randint(0, nx)] = True
    f0 = np.asarray(reference.initial_state(params)) * rng.uniform(
        0.8, 1.2, (9, ny, nx)
    ).astype(np.float32)
    return params, jnp.asarray(mask), jnp.asarray(f0)


@pytest.mark.parametrize(
    "ny,nx,iters",
    [
        (32, 128, 2),   # 2 tiles at ty=16, single double-step
        (32, 128, 9),   # odd: exercises the 1-step tail
        (64, 128, 8),   # 4 tiles
        (64, 256, 6),
    ],
)
def test_matches_oracle(ny, nx, iters):
    params, obst, f0 = make_case(ny, nx)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=iters)
    fb, avb = pallas_multi.run(f0, obst, params, n_iters=iters, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=1e-4)


def test_from_rest_forcing_through_both_windows():
    """From equilibrium-at-rest only the forcing drives flow; any seam or
    double/missed application of it shows up immediately."""
    params, obst, _ = make_case(32, 128)
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=6)
    fb, avb = pallas_multi.run(f0, obst, params, n_iters=6, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_supported():
    assert pallas_multi._pick_tile_rows(1024, 1024) is not None
    assert pallas_multi._pick_tile_rows(30, 128) is None
