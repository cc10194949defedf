"""The MXU-formulated collision must equal the production vector form."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import kernel_common, mxu_collide, reference
from advanced_hpc_lbm_tpu.params import LBMParams


@pytest.mark.parametrize("omega", [0.8, 1.0, 1.85, 1.95])
def test_matches_kernel_common(omega):
    params = LBMParams(
        nx=128, ny=16, max_iters=1, reynolds_dim=10,
        density=0.1, accel=0.005, omega=omega,
    )
    rng = np.random.RandomState(int(omega * 100))
    streamed = [
        jnp.asarray(
            (np.asarray(reference.initial_state(params))[k]
             * rng.uniform(0.7, 1.3, (16, 128))).astype(np.float32)
        )
        for k in range(9)
    ]
    obst = jnp.asarray(rng.rand(16, 128) < 0.15)

    out_ref, usq_ref = kernel_common.collide(streamed, obst, params)

    flat = jnp.stack([s.reshape(-1) for s in streamed])
    out_mxu, usq_mxu = mxu_collide.collide_flat(
        flat, obst.reshape(-1), params
    )

    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(out_mxu[k]).reshape(16, 128),
            np.asarray(out_ref[k]),
            rtol=2e-5,
            atol=2e-7,
            err_msg=f"plane {k} (omega={omega})",
        )
    # u_sq compared on fluid cells (kernel_common computes it everywhere
    # from the same moments; identical math, different association)
    np.testing.assert_allclose(
        np.asarray(usq_mxu).reshape(16, 128),
        np.asarray(usq_ref),
        rtol=5e-4,
        atol=1e-12,
    )


def test_mass_momentum_conserved():
    """The contraction matrix must conserve rho and momentum exactly (in
    exact arithmetic): columns of the linear block sum to 1, and the
    momentum projections of the output match the input."""
    params = LBMParams(128, 16, 1, 10, 0.1, 0.005, 1.85)
    mat, _, _ = mxu_collide._constants(params)
    a_lin = mat[3:12].astype(np.float64)
    # sum_k A[k, j] == 1 for every source speed j (mass conservation)
    np.testing.assert_allclose(a_lin.sum(axis=0), np.ones(9), atol=1e-12)
    # momentum: sum_k c_k A[k, j] == c_j
    from advanced_hpc_lbm_tpu.ops import lattice

    np.testing.assert_allclose(
        (lattice.CX[:, None] * a_lin).sum(axis=0), lattice.CX, atol=1e-12
    )
    np.testing.assert_allclose(
        (lattice.CY[:, None] * a_lin).sum(axis=0), lattice.CY, atol=1e-12
    )


def test_in_kernel_path_matches_vpu_kernel():
    """The in-kernel MXU formulation (the exact kernel the decision
    benchmark scripts/mxu_inkernel_bench.py times) must track the VPU
    collide kernel trajectory in interpret mode."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))
    try:
        import mxu_inkernel_bench as mib
    finally:
        sys.path.pop(0)

    f0 = np.asarray(reference.initial_state(mib.PARAMS))
    rng = np.random.RandomState(3)
    f0 = (f0 * (1.0 + 0.01 * rng.standard_normal(f0.shape))).astype(np.float32)

    va = np.asarray(mib.build("vpu", 4, interpret=True)(jnp.asarray(f0)))
    vb = np.asarray(
        mib.build("mxu", 4, interpret=True)(jnp.asarray(f0.reshape(9, -1)))
    ).reshape(f0.shape)
    np.testing.assert_allclose(vb, va, rtol=2e-5, atol=2e-7)
