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

import jax
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


def _collide_window_inplace(load, store, ob, params: LBMParams):
    """Phase B of the lean window step — moments + pairwise BGK +
    bounce-back, in place through ``load(k)``/``store(k, v)`` plane
    accessors.  ONE implementation serves both the full-window form and
    the static-slice trapezoid form so their bitwise-equality contract
    (the trapezoid is kept as a differential oracle of the full window)
    is structural, not a property two hand-kept copies must preserve.
    Returns u_sq of the post-stream moments."""
    omega = params.omega_f32
    om1 = jnp.float32(1.0) - omega

    rho = load(0)
    for kk in range(1, lattice.NSPEEDS):
        rho = rho + load(kk)
    inv_rho = 1.0 / rho
    u_x = (
        load(1) + load(5) + load(8) - load(3) - load(6) - load(7)
    ) * inv_rho
    u_y = (
        load(2) + load(5) + load(6) - load(4) - load(7) - load(8)
    ) * inv_rho
    u_sq = u_x * u_x + u_y * u_y
    base = 1.0 - u_sq * jnp.float32(1.5)

    s0 = load(0)
    store(
        0,
        jnp.where(
            ob, s0,
            (jnp.float32(lattice.W[0]) * omega) * rho * base + om1 * s0,
        ),
    )

    def pair(kk, cu):
        ko = int(lattice.OPP[kk])
        sk, sko = load(kk), load(ko)
        tw = (jnp.float32(lattice.W[kk]) * omega) * rho
        even = base + (cu * cu) * jnp.float32(4.5)
        odd = cu * jnp.float32(3.0)
        store(kk, jnp.where(ob, sko, tw * (even + odd) + om1 * sk))
        store(ko, jnp.where(ob, sk, tw * (even - odd) + om1 * sko))

    pair(1, u_x)
    pair(2, u_y)
    pair(5, u_x + u_y)
    pair(8, u_x - u_y)
    return u_sq


def lean_window_step(src, dst, w_obst, accel_T, params: LBMParams, T: int, nx: int):
    """One liveness-lean force+stream+collide step over a full (T, nx)
    window: each plane is forced and pull-rolled straight from ``src[kk]``
    into ``dst[kk]`` (Pallas refs or any plane-indexable buffers), then
    moments come from dst reloads and each collision pair is stored as
    computed — peak liveness stays a handful of planes, which is what
    lets whole windows sit in VMEM without Mosaic spill round-trips
    (BENCH.md "The liveness-lean resident step").

    The y-roll wraps at the window edge; ghost-zone callers rely on the
    wrap garbage landing exactly in the rows the trapezoid invalidates
    (ops.pallas_k._kernel_k_lean for the periodic single-chip tiles,
    ops.pallas_local._local_ca_kernel for sharded ±K ghost windows).
    Same fp op order as :func:`collide` — the oracle contract.

    Args:
      src / dst: plane-indexable window buffers, ``src[kk]`` -> (T, nx).
      w_obst: (T, nx) bool obstacle window.
      accel_T: (T, nx) bool — True on (every image of) global row ny-2.
      T, nx: window shape (the roll moduli).

    Returns u_sq (T, nx) of the post-stream (= post-collision) moments
    for the caller's own-rows reduction slice.
    """
    from jax.experimental.pallas import tpu as pltpu

    zero = jnp.float32(0.0)
    w1a, w2a = params.accel_w1, params.accel_w2
    deltas = {1: w1a, 5: w2a, 8: w2a, 3: -w1a, 6: -w2a, 7: -w2a}

    ok = (
        accel_T
        & jnp.logical_not(w_obst)
        & (src[3] - w1a > 0.0)
        & (src[6] - w2a > 0.0)
        & (src[7] - w2a > 0.0)
    )
    # phase A: force + pull-stream each plane into dst (full window)
    for kk in range(lattice.NSPEEDS):
        cy, cx = int(lattice.CY[kk]), int(lattice.CX[kk])
        plane = src[kk]
        dv = deltas.get(kk)
        if dv is not None:
            plane = plane + jnp.where(ok, jnp.float32(dv), zero)
        if cy:
            plane = pltpu.roll(plane, cy % T, axis=0)
        if cx:
            plane = pltpu.roll(plane, cx % nx, axis=1)
        dst[kk] = plane

    # phase B: moments + pairwise BGK + bounce-back, in place on dst
    def load(kk):
        return dst[kk]

    def store(kk, v):
        dst[kk] = v

    return _collide_window_inplace(load, store, w_obst, params)


def lean_window_step_rows(
    src, dst, w_obst, accel_T, params: LBMParams, T: int, nx: int,
    lo: int, hi: int,
):
    """:func:`lean_window_step` restricted to output rows [lo, hi) — the
    static-slice trapezoid form.

    The full-window form computes all T rows every step and lets the
    y-roll's wrap garbage land in the rows the trapezoid invalidates;
    this form instead never computes the invalidated rows at all: each
    plane's pull reads source rows [lo-cy, hi-cy) as a STATIC slice (no
    y-roll — the rows a wrap would corrupt are simply never read),
    forcing is evaluated on those source rows, and phase B runs on the
    (hi-lo)-row subwindow.  Per-row fp ops are identical to
    lean_window_step, so the rows both forms compute are bitwise equal
    (tests/test_stream.py trapezoid equivalence); a K-step caller
    shrinking [lo, hi) by one row per side per step computes
    K*(T-K-1)/(K*T) of the full-window rows — an 11%/14%/23% VPU cut at
    the 8192²/16384²/18432² stream tiles.

    Requires 1 <= lo and hi <= T-1 (the pull and the forcing guard read
    one row past each bound).  Rows of ``dst`` outside [lo, hi) are left
    untouched (stale) — callers must never read them, which the
    shrinking schedule guarantees.  Returns u_sq for rows [lo, hi).
    """
    from jax.experimental.pallas import tpu as pltpu

    assert 1 <= lo < hi <= T - 1, (lo, hi, T)
    n = hi - lo
    zero = jnp.float32(0.0)
    w1a, w2a = params.accel_w1, params.accel_w2
    deltas = {1: w1a, 5: w2a, 8: w2a, 3: -w1a, 6: -w2a, 7: -w2a}

    # forcing guard on the SOURCE rows any plane may pull: [lo-1, hi+1)
    a = lo - 1
    okS = (
        accel_T[a : a + n + 2]
        & jnp.logical_not(w_obst[a : a + n + 2])
        & (src[3, a : a + n + 2, :] - w1a > 0.0)
        & (src[6, a : a + n + 2, :] - w2a > 0.0)
        & (src[7, a : a + n + 2, :] - w2a > 0.0)
    )
    # phase A: force + pull each plane's [lo-cy, hi-cy) source slice
    for kk in range(lattice.NSPEEDS):
        cy, cx = int(lattice.CY[kk]), int(lattice.CX[kk])
        plane = src[kk, lo - cy : hi - cy, :]
        dv = deltas.get(kk)
        if dv is not None:
            ok_k = jax.lax.slice_in_dim(okS, 1 - cy, 1 - cy + n, axis=0)
            plane = plane + jnp.where(ok_k, jnp.float32(dv), zero)
        if cx:
            plane = pltpu.roll(plane, cx % nx, axis=1)
        dst[kk, lo:hi, :] = plane

    # phase B: moments + pairwise BGK + bounce-back on the subwindow
    ob = jax.lax.slice_in_dim(w_obst, lo, hi, axis=0)

    def load(kk):
        return dst[kk, lo:hi, :]

    def store(kk, v):
        dst[kk, lo:hi, :] = v

    return _collide_window_inplace(load, store, ob, params)
