"""K-step ghost-zone kernel vs the jnp oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, pallas_k, reference
from advanced_hpc_lbm_tpu.params import LBMParams


def make_deck(ny, nx, seed=5):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=32, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(seed)
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[ny // 2 : ny // 2 + 2, 20:60] = True
    for _ in range(6):
        mask[rng.randint(1, ny - 1), rng.randint(0, nx)] = True
    return params, jnp.asarray(mask)


@pytest.mark.parametrize("lean", [False, True], ids=["naive", "lean"])
@pytest.mark.parametrize("k", [2, 3, 4, 6, 8])
def test_multi_step_matches_oracle(k, lean):
    params, obst = make_deck(64, 128)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    f0 = reference.initial_state(params)

    n = 2 * k
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=n)

    f = reference.initial_state(params)
    obst_f = pallas_k.prepare_obstacles(obst)
    avs = []
    import os

    os.environ["LBM_PALLASK_TY"] = "16"
    try:
        for _ in range(2):
            f, av_k = pallas_k.multi_step(
                f, obst_f, n_fluid, params, k, interpret=True, lean=lean
            )
            avs.append(av_k)
    finally:
        del os.environ["LBM_PALLASK_TY"]
    avb = jnp.concatenate(avs)

    np.testing.assert_allclose(
        np.asarray(f), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


@pytest.mark.parametrize("lean", [False, True], ids=["naive", "lean"])
def test_single_tile_grid_matches_oracle(lean):
    """ty == ny (one tile owns the whole grid): the top halo wrap rows,
    parked-row re-park and bottom halo all alias the same tile — the
    shape the ty=128 pick produces on 128-row decks."""
    params, obst = make_deck(32, 128, seed=5)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    k = 4
    fa, ava = fused.run_simulation(
        reference.initial_state(params), obst, params, n_iters=k
    )
    import os

    os.environ["LBM_PALLASK_TY"] = "32"  # == ny -> grid=(1,)
    try:
        fb, avb = pallas_k.multi_step(
            reference.initial_state(params),
            pallas_k.prepare_obstacles(obst),
            n_fluid, params, k, interpret=True, lean=lean,
        )
    finally:
        del os.environ["LBM_PALLASK_TY"]
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


@pytest.mark.parametrize("k", [3, 4])
def test_run_matches_oracle_with_tail(k):
    """Full runner incl. the 1-step-kernel tail for iters % k != 0."""
    params, obst = make_deck(32, 128, seed=9)
    f0 = reference.initial_state(params)
    n = 2 * k + 1
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=n)

    import os

    os.environ["LBM_PALLASK_TY"] = "8"
    try:
        fb, avb = pallas_k.run(
            reference.initial_state(params), obst, params,
            n_iters=n, k=k, interpret=True,
        )
    finally:
        del os.environ["LBM_PALLASK_TY"]
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)
