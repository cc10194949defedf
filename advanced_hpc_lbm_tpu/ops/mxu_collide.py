"""Experimental: BGK collision as one MXU contraction (flat layout).

The collision's linear algebra — density/momentum moments, the linear part
of the relaxed populations, and the per-speed momentum projections the
quadratic terms need — folds into a single constant (21 x 9) matrix
applied to the speed-major state:

    out_linear_k = sum_j [ (1-w) d_kj + w W_k (1 + 3 c_k.c_j) ] s_j
    cm_k         = sum_j (c_k.c_j) s_j          (momentum projections)
    rho, m_x, m_y = moment rows

leaving ~40 VPU ops/cell of nonlinear work:

    out_k = out_linear_k + (w W_k) (4.5 cm_k^2 - 1.5 |m|^2) / rho

With the state stored flat as (9, L = ny*nx), the contraction maps onto
the MXU (~L/128 cycles) instead of ~80 VPU vector ops — the lever DESIGN.md
sizes for the VPU-bound small-grid regime (round-2 target: wire this into
ops.resident with flat-layout streaming).

This module validates the mathematics: :func:`collide_flat` is asserted
equal to ops.kernel_common.collide in the test suite.  It is NOT used by
any production backend: measured at the jnp/XLA level on 1024^2 it is ~3x
SLOWER than the vector form (the (21, L) projection materializes ~84 MB of
HBM intermediates per step), so the formulation only pays inside a kernel
where `proj` stays in VMEM — the round-2 experiment is to embed this
contraction in ops.resident's fori body, where the state is already
VMEM-resident and the VPU is the binding resource.

Probed in-kernel feasibility (2026-08-16): a (21x9)@(9,16384) jnp.dot
compiles and runs inside a Pallas kernel, BUT the MXU rounds fp32 inputs
through bf16 (~0.25% error — fatal over 40k steps); the in-kernel
contraction must use ``precision=jax.lax.Precision.HIGHEST`` (3-pass
fp32 emulation).

MEASURED IN-KERNEL VERDICT (round 2, scripts/mxu_inkernel_bench.py,
interleaved A/B on VMEM-resident 128^2 state, 20k iters/call so dispatch
noise is amortized): the flat MXU collide runs at 5.2 us/iter vs the VPU
pairwise collide's 3.1 us/iter — the MXU LOSES 1.67x on the collide stage
alone, before paying for the costlier flat-layout streaming.  The round-1
sizing ("~L/128 MXU cycles") was wrong: with M=21, K=9 the systolic array
is N-bound at ~1 column (128 lanes **of one output row-tile**) per cycle,
so the contraction costs ~L cycles x3 (HIGHEST passes) ~ 3x the entire
VPU step budget.  The MXU cannot beat the VPU on an operator this small;
this module stays as oracle-verified mathematics + the measurement
harness, and is deliberately NOT a production backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from advanced_hpc_lbm_tpu.ops import lattice
from advanced_hpc_lbm_tpu.params import LBMParams


@functools.lru_cache(maxsize=8)
def _constants(params: LBMParams) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(21, 9) contraction matrix + the per-speed nonlinear weights.

    Rows 0..2: [rho; m_x; m_y]; rows 3..11: linear part of the relaxed
    populations; rows 12..20: cm_k projections."""
    omega = float(params.omega_f32)
    cdot = (
        lattice.CX[:, None] * lattice.CX[None, :]
        + lattice.CY[:, None] * lattice.CY[None, :]
    ).astype(np.float64)

    top = np.stack(
        [np.ones(9), lattice.CX.astype(np.float64), lattice.CY.astype(np.float64)]
    )
    a_lin = omega * lattice.W[:, None].astype(np.float64) * (
        1.0 + 3.0 * cdot
    ) + (1.0 - omega) * np.eye(9)
    mat = np.concatenate([top, a_lin, cdot], axis=0).astype(np.float32)

    w_quad = (omega * 4.5 * lattice.W).astype(np.float32)  # * cm^2
    w_msq = (omega * 1.5 * lattice.W).astype(np.float32)  # * |m|^2
    return mat, w_quad, w_msq


def collide_flat(
    streamed_flat: jax.Array, obst_flat: jax.Array, params: LBMParams
) -> tuple[jax.Array, jax.Array]:
    """MXU-formulated collide + bounce-back on a (9, L) state.

    Args:
      streamed_flat: (9, L) fp32 post-streaming populations.
      obst_flat: (L,) bool, True = blocked.
      params: static run parameters.

    Returns (out (9, L), u_sq (L,)) — same contract as kernel_common.collide
    modulo the flat layout.
    """
    mat, w_quad, w_msq = _constants(params)
    proj = jax.lax.dot_general(
        jnp.asarray(mat),
        streamed_flat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (21, L)
    rho, m_x, m_y = proj[0], proj[1], proj[2]
    lin = proj[3:12]  # (9, L)
    cm = proj[12:21]  # (9, L)

    inv_rho = 1.0 / rho
    msq = m_x * m_x + m_y * m_y
    quad = (
        jnp.asarray(w_quad)[:, None] * (cm * cm)
        - jnp.asarray(w_msq)[:, None] * msq[None]
    ) * inv_rho[None]
    out = lin + quad

    reflected = streamed_flat[jnp.asarray(lattice.OPP)]
    out = jnp.where(obst_flat[None], reflected, out)

    u_sq = msq * (inv_rho * inv_rho)
    return out, u_sq
