"""Randomized differential fuzzing across backends.

Random grid shapes, physics parameters and obstacle geometries, run through
the legacy pipeline (reference-granularity oracle), the fused production
step, and the Pallas kernels (interpret) — all must agree.  Seeded and
bounded so the suite stays deterministic and fast.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, pallas_multi, pallas_step, reference
from advanced_hpc_lbm_tpu.params import LBMParams


def random_case(rng):
    ny = int(rng.choice([8, 16, 24, 32, 48]))
    nx = int(rng.choice([128, 256]))
    params = LBMParams(
        nx=nx,
        ny=ny,
        max_iters=int(rng.randint(2, 7)),
        reynolds_dim=int(rng.randint(2, 50)),
        density=float(rng.uniform(0.05, 0.5)),
        accel=float(rng.uniform(0.001, 0.02)),
        omega=float(rng.uniform(0.5, 1.95)),
    )
    mask = rng.rand(ny, nx) < rng.uniform(0.0, 0.25)
    # never fully blocked
    mask[ny // 2, nx // 2] = False
    f0 = np.asarray(reference.initial_state(params)) * rng.uniform(
        0.7, 1.3, (9, ny, nx)
    ).astype(np.float32)
    return params, jnp.asarray(mask), jnp.asarray(f0)


@pytest.mark.parametrize("seed", range(8))
def test_backends_agree_on_random_decks(seed):
    rng = np.random.RandomState(1000 + seed)
    params, obst, f0 = random_case(rng)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)

    f_pipe, f_fused, f_p1 = f0, f0, f0
    obst8 = pallas_step.prepare_obstacles(obst)
    for _ in range(params.max_iters):
        f_pipe, _ = reference.timestep_pipeline(f_pipe, obst, params)
        f_fused, _ = fused.fused_step(f_fused, obst, n_fluid, params)
        f_p1, _ = pallas_step.pallas_fused_step(
            f_p1, obst8, n_fluid, params, interpret=True
        )
    np.testing.assert_allclose(
        np.asarray(f_fused), np.asarray(f_pipe), rtol=1e-5, atol=1e-7,
        err_msg=f"fused vs pipeline diverged (seed {seed}, {params})",
    )
    np.testing.assert_allclose(
        np.asarray(f_p1), np.asarray(f_fused), rtol=1e-4, atol=1e-6,
        err_msg=f"pallas vs fused diverged (seed {seed}, {params})",
    )

    # 2-step kernel over the full horizon (handles its own odd tail)
    f_p2, _ = pallas_multi.run(
        f0, obst, params, n_iters=params.max_iters, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(f_p2), np.asarray(f_fused), rtol=1e-4, atol=1e-6,
        err_msg=f"pallas2 vs fused diverged (seed {seed}, {params})",
    )

    # VMEM-resident whole-run kernel (its own chunking/ping-pong)
    from advanced_hpc_lbm_tpu.ops import resident

    f_res, _ = resident.resident_run(
        f0, obst, params, n_iters=params.max_iters, chunk=3, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(f_res), np.asarray(f_fused), rtol=1e-4, atol=1e-6,
        err_msg=f"resident vs fused diverged (seed {seed}, {params})",
    )

    # K-step ghost-zone kernel (K=2, ty forced to 8 so every random ny
    # tiles; handles its own odd tail via the 1-step kernel)
    import os

    from advanced_hpc_lbm_tpu.ops import pallas_k

    os.environ["LBM_PALLASK_TY"] = "8"
    try:
        f_pk, _ = pallas_k.run(
            f0, obst, params, n_iters=params.max_iters, k=2, interpret=True
        )
    finally:
        del os.environ["LBM_PALLASK_TY"]
    np.testing.assert_allclose(
        np.asarray(f_pk), np.asarray(f_fused), rtol=1e-4, atol=1e-6,
        err_msg=f"pallask vs fused diverged (seed {seed}, {params})",
    )


@pytest.mark.parametrize("seed", range(6))
def test_stream_kernel_agrees_on_random_decks(seed, monkeypatch):
    """The HBM-streaming kernel (both step forms) on random decks: the
    K=8 manual-DMA pass + 1-step tail must track the fused oracle, and
    the trapezoid step must be BITWISE the full-window step."""
    from advanced_hpc_lbm_tpu.ops import pallas_stream

    rng = np.random.RandomState(2000 + seed)
    params, obst, f0 = random_case(rng)
    # at least one full K=8 pass plus a 1-step tail sometimes
    iters = int(rng.randint(8, 20))
    monkeypatch.setenv("LBM_STREAM_TY", "8")
    n_fluid = jnp.sum(~obst).astype(jnp.float32)

    f_ref = f0
    for _ in range(iters):
        f_ref, _ = fused.fused_step(f_ref, obst, n_fluid, params)

    f_s, av_s = pallas_stream.run(
        f0, obst, params, n_iters=iters, interpret=True, inplace=True
    )
    np.testing.assert_allclose(
        np.asarray(f_s), np.asarray(f_ref), rtol=1e-4, atol=1e-6,
        err_msg=f"stream vs fused diverged (seed {seed}, {params})",
    )
    f_t, av_t = pallas_stream.run(
        f0, obst, params, n_iters=iters, interpret=True, inplace=True,
        trapezoid=True,
    )
    np.testing.assert_array_equal(
        np.asarray(f_t), np.asarray(f_s),
        err_msg=f"trapezoid != full-window (seed {seed}, {params})",
    )
    np.testing.assert_array_equal(np.asarray(av_t), np.asarray(av_s))
