"""Batched (data-parallel) runs vs sequential single runs.

The reference's array job runs B independent copies as separate Slurm
tasks (job_submit_array:11); here the batch is one vmapped program,
optionally sharded over the mesh, and must reproduce the sequential
trajectories exactly (same step kernel, same fp op order per deck).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, reference
from advanced_hpc_lbm_tpu.parallel import batch
from advanced_hpc_lbm_tpu.params import LBMParams


@pytest.fixture(scope="module")
def decks():
    params = LBMParams(
        nx=32, ny=40, max_iters=30, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(11)
    masks = []
    for b in range(4):
        mask = np.zeros((params.ny, params.nx), dtype=bool)
        mask[0] = mask[-1] = True
        for _ in range(6):
            mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
        masks.append(mask)
    return params, np.stack(masks)


def _sequential(params, masks):
    outs = []
    for mask in masks:
        f0 = reference.initial_state(params)
        f, av = jax.jit(
            lambda f, o: fused.run_simulation(f, o, params)
        )(f0, jnp.asarray(mask))
        outs.append((np.asarray(f), np.asarray(av)))
    return outs


def test_vmap_batch_matches_sequential(decks):
    params, masks = decks
    f0 = batch.batch_initial_state(params, masks.shape[0])
    fs, avs = batch.batch_run(f0, jnp.asarray(masks), params)
    assert fs.shape == (4, 9, params.ny, params.nx)
    assert avs.shape == (4, params.max_iters)
    for b, (f_ref, av_ref) in enumerate(_sequential(params, masks)):
        np.testing.assert_allclose(np.asarray(avs)[b], av_ref, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fs)[b], f_ref, rtol=1e-6)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_mesh_batch_matches_vmap(decks, n_devices):
    params, masks = decks
    B = 8  # divisible over every mesh size tested
    obst = batch.replicate(masks[0], B // 2)
    obst = jnp.concatenate([obst, batch.replicate(masks[1], B // 2)])
    f0 = batch.batch_initial_state(params, B)

    fs_v, avs_v = batch.batch_run(f0, obst, params)

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:n_devices]), axis_names=("batch",))
    fs_m, avs_m = batch.batch_run(
        batch.batch_initial_state(params, B), obst, params, mesh=mesh
    )
    np.testing.assert_array_equal(np.asarray(avs_m), np.asarray(avs_v))
    np.testing.assert_array_equal(np.asarray(fs_m), np.asarray(fs_v))


def test_replicated_decks_identical_trajectories(decks):
    """Five identical runs (the reference array job's exact shape) must
    produce identical av histories — replication is for timing variance,
    not physics variance, on a deterministic device."""
    params, masks = decks
    f0 = batch.batch_initial_state(params, 5)
    obst = batch.replicate(masks[0], 5)
    _, avs = batch.batch_run(f0, obst, params)
    avs = np.asarray(avs)
    for b in range(1, 5):
        np.testing.assert_array_equal(avs[b], avs[0])


def test_batch_runner_is_cached(decks):
    """Repeated batch_run calls with the same configuration must reuse the
    jitted runner (compiles are seconds-to-minutes on the real device)."""
    params, masks = decks
    before = batch._jitted.cache_info().hits
    for _ in range(2):
        batch.batch_run(
            batch.batch_initial_state(params, 2),
            jnp.asarray(masks[:2]),
            params,
        )
    assert batch._jitted.cache_info().hits > before


def test_batch_shape_validation(decks):
    params, masks = decks
    f0 = batch.batch_initial_state(params, 3)
    with pytest.raises(ValueError, match="batched"):
        batch.batch_run(f0, jnp.asarray(masks), params)  # B mismatch 3 vs 4
    with pytest.raises(ValueError, match="divisible"):
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("batch",))
        batch.batch_run(
            f0, jnp.asarray(masks[:3]), params, mesh=mesh
        )
