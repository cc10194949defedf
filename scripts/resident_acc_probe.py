"""A/B probe: accumulate moments during the stream pass (phase A) vs the
shipped lean resident step's separate moment-load pass.

If Mosaic fuses the store+accumulate chain, phase B's ~21 moment loads
(84 MB/step at 1024^2) disappear and the step should drop ~15-20%.
Interleaved in one process; cross-checks numerics first.
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def make_acc_step(resident, lattice, pltpu, jnp):
    def _one_step_acc(
        src, dst, obst, accel_rows, t, avs_ref, *, params, ny, nx
    ):
        zero = jnp.float32(0.0)
        w1, w2 = params.accel_w1, params.accel_w2
        ok = (
            accel_rows
            & jnp.logical_not(obst)
            & (src[3] - w1 > 0.0)
            & (src[6] - w2 > 0.0)
            & (src[7] - w2 > 0.0)
        )
        deltas = {1: w1, 5: w2, 8: w2, 3: -w1, 6: -w2, 7: -w2}
        rho = xp = xn = yp = yn = None

        def acc(a, p):
            return p if a is None else a + p

        for k in range(lattice.NSPEEDS):
            plane = src[k]
            dv = deltas.get(k)
            if dv is not None:
                plane = plane + jnp.where(ok, jnp.float32(dv), zero)
            cy, cx = int(lattice.CY[k]), int(lattice.CX[k])
            if cy:
                plane = pltpu.roll(plane, cy % ny, axis=0)
            if cx:
                plane = pltpu.roll(plane, cx % nx, axis=1)
            dst[k] = plane
            rho = acc(rho, plane)
            if k in (1, 5, 8):
                xp = acc(xp, plane)
            elif k in (3, 6, 7):
                xn = acc(xn, plane)
            if k in (2, 5, 6):
                yp = acc(yp, plane)
            elif k in (4, 7, 8):
                yn = acc(yn, plane)

        omega = params.omega_f32
        om1 = jnp.float32(1.0) - omega
        inv_rho = 1.0 / rho
        u_x = (xp - xn) * inv_rho
        u_y = (yp - yn) * inv_rho
        u_sq = u_x * u_x + u_y * u_y
        avs_ref[t, 0] = jnp.sum(jnp.where(obst, zero, jnp.sqrt(u_sq)))
        base = 1.0 - u_sq * jnp.float32(1.5)

        s0 = dst[0]
        dst[0] = jnp.where(
            obst, s0,
            (jnp.float32(lattice.W[0]) * omega) * rho * base + om1 * s0,
        )

        def pair(k, cu):
            ko = int(lattice.OPP[k])
            sk, sko = dst[k], dst[ko]
            tw = (jnp.float32(lattice.W[k]) * omega) * rho
            even = base + (cu * cu) * jnp.float32(4.5)
            odd = cu * jnp.float32(3.0)
            dst[k] = jnp.where(obst, sko, tw * (even + odd) + om1 * sk)
            dst[ko] = jnp.where(obst, sk, tw * (even - odd) + om1 * sko)

        pair(1, u_x)
        pair(2, u_y)
        pair(5, u_x + u_y)
        pair(8, u_x - u_y)

    return _one_step_acc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--size", default="1024x1024")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from advanced_hpc_lbm_tpu.ops import lattice, reference, resident
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    nx, ny = (int(v) for v in args.size.split("x"))
    params = LBMParams(
        nx=nx, ny=ny, max_iters=args.iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: ny // 2, nx // 3] = True
    obstacles = jnp.asarray(mask)

    base_runner = jax.jit(
        lambda f, o, _n=args.iters: resident.resident_run(f, o, params, n_iters=_n)
    )

    def run(runner):
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        av_host = np.asarray(av)
        f_final.block_until_ready()
        assert np.all(np.isfinite(av_host))
        return av_host

    print("# warming baseline lean step ...", flush=True)
    av_a = run(base_runner)

    # swap in the accumulate-in-phase-A step and rebuild
    orig = resident._one_step
    resident._one_step = make_acc_step(resident, lattice, pltpu, jnp)
    resident._build_chunk_call.cache_clear()
    acc_runner = jax.jit(
        lambda f, o, _n=args.iters: resident.resident_run(f, o, params, n_iters=_n)
    )
    print("# warming acc step ...", flush=True)
    av_b = run(acc_runner)
    rel = np.abs(av_b - av_a) / np.maximum(np.abs(av_a), 1e-12)
    print(
        f"# av cross-check: max rel diff {rel.max():.3e} at step "
        f"{int(rel.argmax())}; last-100-steps max {rel[-100:].max():.3e}",
        flush=True,
    )

    times = {"lean": [], "acc": []}
    for _ in range(args.repeats):
        for name, runner in (("lean", base_runner), ("acc", acc_runner)):
            t0 = time.perf_counter()
            run(runner)
            times[name].append(time.perf_counter() - t0)
    resident._one_step = orig

    for name, ts in times.items():
        med, best = float(np.median(ts)), float(np.min(ts))
        print(
            f"{name}: med {med / args.iters * 1e6:.1f} us/step "
            f"({nx * ny * args.iters / med / 1e9:.2f} GLUPS)  "
            f"best {best / args.iters * 1e6:.1f} us/step "
            f"({nx * ny * args.iters / best / 1e9:.2f} GLUPS)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
