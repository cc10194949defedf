"""Shared in-kernel routines for the Pallas backends.

One implementation of the BGK collide + bounce-back vector math used by
ops.pallas_step (1-step tiled), ops.pallas_multi (2-step tiled) and
ops.resident (VMEM-resident whole-run).  Keeping it in one place keeps the
three kernels bit-identical to each other and gives a single tuning point
for the VPU-bound regime (DESIGN.md "Measured performance model").

ALU economy relative to the naive transcription (d2q9-bgk.c:1033-1100):
* pairwise equilibria (opposite speeds share the even part);
* omega folded into the equilibrium prefactor:
  f' = f + w(feq - f) = (w*t)(even +- odd) + (1-w) f  — saves one
  subtract per plane.

(An approximate-reciprocal + Newton variant was tried for 1/rho and
rejected: the interpreter's approx rcp is only ~8-bit, breaking oracle
equivalence, while on hardware the compiler already lowers fp32 divide
to rcp+refinement — no measurable win.)
"""

from __future__ import annotations

import jax.numpy as jnp

from advanced_hpc_lbm_tpu.ops import lattice
from advanced_hpc_lbm_tpu.params import LBMParams


def collide(streamed, obst, params: LBMParams):
    """Pairwise BGK relax + bounce-back select.

    Args:
      streamed: list of 9 post-streaming planes (same shape each).
      obst: bool mask (same shape), True = blocked.
      params: static run parameters.

    Returns (out_planes, u_sq) — u_sq of the streamed (= post-collision)
    moments, for the ||u|| reduction.
    """
    omega = params.omega_f32
    om1 = jnp.float32(1.0) - omega

    rho = streamed[0]
    for k in range(1, lattice.NSPEEDS):
        rho = rho + streamed[k]
    inv_rho = 1.0 / rho
    u_x = (
        streamed[1] + streamed[5] + streamed[8]
        - streamed[3] - streamed[6] - streamed[7]
    ) * inv_rho
    u_y = (
        streamed[2] + streamed[5] + streamed[6]
        - streamed[4] - streamed[7] - streamed[8]
    ) * inv_rho
    u_sq = u_x * u_x + u_y * u_y
    base = 1.0 - u_sq * jnp.float32(1.5)

    out = [None] * lattice.NSPEEDS

    def pair(k, cu):
        ko = int(lattice.OPP[k])
        t = (jnp.float32(lattice.W[k]) * omega) * rho
        even = base + (cu * cu) * jnp.float32(4.5)
        odd = cu * jnp.float32(3.0)
        out[k] = t * (even + odd) + om1 * streamed[k]
        out[ko] = t * (even - odd) + om1 * streamed[ko]

    out[0] = (jnp.float32(lattice.W[0]) * omega) * rho * base + om1 * streamed[0]
    pair(1, u_x)
    pair(2, u_y)
    pair(5, u_x + u_y)
    pair(8, u_x - u_y)

    for k in range(lattice.NSPEEDS):
        out[k] = jnp.where(obst, streamed[int(lattice.OPP[k])], out[k])
    return out, u_sq


def forced(planes, obst, row_is_accel, params: LBMParams):
    """Masked acceleration forcing over a window (d2q9-bgk.c:239-260):
    row_is_accel marks global row ny-2."""
    w1, w2 = params.accel_w1, params.accel_w2
    ok = (
        row_is_accel
        & jnp.logical_not(obst)
        & (planes[3] - w1 > 0.0)
        & (planes[6] - w2 > 0.0)
        & (planes[7] - w2 > 0.0)
    )
    zero = jnp.float32(0.0)
    out = list(planes)
    for k, dv in ((1, w1), (5, w2), (8, w2), (3, -w1), (6, -w2), (7, -w2)):
        out[k] = planes[k] + jnp.where(ok, jnp.float32(dv), zero)
    return out
