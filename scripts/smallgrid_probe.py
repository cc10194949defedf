#!/usr/bin/env python
"""Small-grid per-step floor attack (VERDICT round-2 item 3).

128^2 spends most of its ~2-2.5 us step on fixed in-kernel cost: ~80
full-plane vector ops of only 16 vregs each.  This probe A/Bs resident-
kernel step variants that cut whole-plane op count, interleaved in ONE
process (CLAUDE.md benchmarking rules):

  V0  shipped lean step (ops.resident baseline)
  V1  skip plane-0 copy (phase B reads src[0]; dst[0] written by collide)
  V2  V1 + granule forcing: the forcing row ny-2 lives in the last 8-row
      granule, so force 6 (8, nx) slices in place on src instead of six
      full-plane masked adds (resident-only: T=ny, row ny-2 is granule-
      aligned; in the double-step src is fully overwritten next step)
  V3  V2 + 8-step unrolled body with (8, nx) granule stores of per-step
      row-sums (lane reduction moved out of the kernel; SMEM scalar
      write and cross-lane tree eliminated)

Each variant is validated against V0 (av trajectory + final state) before
timing.  Usage: python scripts/smallgrid_probe.py [--sizes 128 256]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", type=int, default=[128, 256])
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--variants", nargs="*",
        default=["v0", "v1", "v2", "v3", "v4"],
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from advanced_hpc_lbm_tpu.ops import (
        kernel_common, lattice, reference, resident,
    )
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    # ----- variant step bodies ------------------------------------------

    def step_variant(src, dst, obst, accel_rows, params, ny, nx,
                     *, skip0: bool, gran: bool):
        """One force+stream+collide step; same fp op order as
        kernel_common.lean_window_step (the oracle contract)."""
        zero = jnp.float32(0.0)
        w1a, w2a = params.accel_w1, params.accel_w2
        omega = params.omega_f32
        om1 = jnp.float32(1.0) - omega
        deltas = {1: w1a, 5: w2a, 8: w2a, 3: -w1a, 6: -w2a, 7: -w2a}

        if gran:
            g = ny - 8
            accel8 = (
                jax.lax.broadcasted_iota(jnp.int32, (8, nx), 0) == 6
            )  # row ny-2 within the last granule
            obst8 = obst[g:ny, :]
            ok8 = (
                accel8
                & jnp.logical_not(obst8)
                & (src[3, g:ny, :] - w1a > 0.0)
                & (src[6, g:ny, :] - w2a > 0.0)
                & (src[7, g:ny, :] - w2a > 0.0)
            )
            for kk, dv in deltas.items():
                src[kk, g:ny, :] = src[kk, g:ny, :] + jnp.where(
                    ok8, jnp.float32(dv), zero
                )
            ok = None
        else:
            ok = (
                accel_rows
                & jnp.logical_not(obst)
                & (src[3] - w1a > 0.0)
                & (src[6] - w2a > 0.0)
                & (src[7] - w2a > 0.0)
            )

        for kk in range(lattice.NSPEEDS):
            if skip0 and kk == 0:
                continue
            cy, cx = int(lattice.CY[kk]), int(lattice.CX[kk])
            plane = src[kk]
            if not gran:
                dv = deltas.get(kk)
                if dv is not None:
                    plane = plane + jnp.where(ok, jnp.float32(dv), zero)
            if cy:
                plane = pltpu.roll(plane, cy % ny, axis=0)
            if cx:
                plane = pltpu.roll(plane, cx % nx, axis=1)
            dst[kk] = plane

        s0 = src[0] if skip0 else dst[0]
        rho = s0
        for kk in range(1, lattice.NSPEEDS):
            rho = rho + dst[kk]
        inv_rho = 1.0 / rho
        u_x = (dst[1] + dst[5] + dst[8] - dst[3] - dst[6] - dst[7]) * inv_rho
        u_y = (dst[2] + dst[5] + dst[6] - dst[4] - dst[7] - dst[8]) * inv_rho
        u_sq = u_x * u_x + u_y * u_y
        base = 1.0 - u_sq * jnp.float32(1.5)

        dst[0] = jnp.where(
            obst, s0,
            (jnp.float32(lattice.W[0]) * omega) * rho * base + om1 * s0,
        )

        def pair(kk, cu):
            ko = int(lattice.OPP[kk])
            sk, sko = dst[kk], dst[ko]
            tw = (jnp.float32(lattice.W[kk]) * omega) * rho
            even = base + (cu * cu) * jnp.float32(4.5)
            odd = cu * jnp.float32(3.0)
            dst[kk] = jnp.where(obst, sko, tw * (even + odd) + om1 * sk)
            dst[ko] = jnp.where(obst, sk, tw * (even - odd) + om1 * sko)

        pair(1, u_x)
        pair(2, u_y)
        pair(5, u_x + u_y)
        pair(8, u_x - u_y)
        return u_sq

    def step_value(src, dst, obst, accel_rows, params, ny, nx):
        """V4: value-form step — force/stream/collide on VALUES (the naive
        three-list form kernel_common.forced + collide), one store per
        plane at the end.  At 1024^2 this form spills ~2 buffers of VMEM
        (BENCH.md round 2) but at <=512^2 planes are <=1 MB and the
        hypothesis is Mosaic's scheduler buys ILP the ref-store lean form
        gives up (the small-grid floor is issue/ILP-bound, not op-count
        bound — V1-V3 measured ~4% total)."""
        planes = [src[kk] for kk in range(lattice.NSPEEDS)]
        planes = kernel_common.forced(planes, obst, accel_rows, params)
        streamed = []
        for kk in range(lattice.NSPEEDS):
            cy, cx = int(lattice.CY[kk]), int(lattice.CX[kk])
            p = planes[kk]
            if cy:
                p = pltpu.roll(p, cy % ny, axis=0)
            if cx:
                p = pltpu.roll(p, cx % nx, axis=1)
            streamed.append(p)
        out, u_sq = kernel_common.collide(streamed, obst, params)
        for kk in range(lattice.NSPEEDS):
            dst[kk] = out[kk]
        return u_sq

    def make_chunk_call(params, ny, nx, n_steps, variant: str):
        """variant in {'v1','v2','v3','v4'}; V0 uses ops.resident directly."""
        skip0 = True
        gran = variant in ("v2", "v3")
        rowsum = variant == "v3"

        def kernel(f_ref, obst_ref, out_ref, avs_ref):
            obst = obst_ref[...].astype(jnp.float32) != 0.0
            accel_rows = (
                jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0) == ny - 2
            )
            fluid = jnp.where(obst, jnp.float32(0.0), jnp.float32(1.0))

            if variant == "v4":
                step = functools.partial(
                    step_value, obst=obst, accel_rows=accel_rows,
                    params=params, ny=ny, nx=nx,
                )
            else:
                step = functools.partial(
                    step_variant, obst=obst, accel_rows=accel_rows,
                    params=params, ny=ny, nx=nx, skip0=skip0, gran=gran,
                )

            if rowsum:
                assert n_steps % 8 == 0

                def oct_step(s, carry):
                    rows = []
                    for j in range(8):
                        src, dst = (f_ref, out_ref) if j % 2 == 0 else (out_ref, f_ref)
                        u_sq = step(src, dst)
                        rows.append(
                            jnp.sum(fluid * jnp.sqrt(u_sq), axis=0, keepdims=True)
                        )
                    avs_ref[pl.ds(8 * s, 8), :] = jnp.concatenate(rows, axis=0)
                    return carry

                jax.lax.fori_loop(0, n_steps // 8, oct_step, 0)
                # even step count: state ends in f_ref; publish
                for k in range(lattice.NSPEEDS):
                    out_ref[k] = f_ref[k]
            else:

                def one(src, dst, t):
                    u_sq = step(src, dst)
                    avs_ref[t, 0] = jnp.sum(fluid * jnp.sqrt(u_sq))

                def double_step(s, carry):
                    one(f_ref, out_ref, 2 * s)
                    one(out_ref, f_ref, 2 * s + 1)
                    return carry

                jax.lax.fori_loop(0, n_steps // 2, double_step, 0)
                for k in range(lattice.NSPEEDS):
                    out_ref[k] = f_ref[k]

        avs_shape = (n_steps, nx) if rowsum else (n_steps, 1)
        avs_space = pltpu.VMEM if rowsum else pltpu.SMEM
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((9, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ny, nx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((9, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=avs_space)
                if not rowsum
                else pl.BlockSpec((n_steps, nx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
                jax.ShapeDtypeStruct(avs_shape, jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=int(120 * ny * nx) * n_steps,
                bytes_accessed=int(73 * ny * nx),
                transcendentals=int(ny * nx) * n_steps,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
        )

    def variant_run(f0, obst8, n_fluid, params, iters, chunk, variant):
        ny, nx = params.ny, params.nx
        rowsum = variant == "v3"
        n_chunks, tail = divmod(iters, chunk)
        assert tail == 0, "probe uses chunk-divisible iters"
        call = make_chunk_call(params, ny, nx, chunk, variant)

        def body(carry_f, _):
            f_next, avs = call(carry_f, obst8)
            tot = avs.sum(axis=1) if rowsum else avs[:, 0]
            return f_next, tot

        f, av = jax.lax.scan(body, f0, None, length=n_chunks)
        return f, av.reshape(-1) / n_fluid

    # ----- build decks + runners ----------------------------------------

    ITERS = {128: 40000, 256: 20000, 512: 8000}
    runners = {}
    for n in args.sizes:
        params = LBMParams(
            nx=n, ny=n, max_iters=ITERS.get(n, 4000), reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        mask = np.zeros((n, n), dtype=bool)
        mask[0] = mask[-1] = True
        mask[:, 0] = mask[:, -1] = True
        obst8 = jnp.asarray(mask).astype(jnp.int8)
        n_fluid = jnp.sum(~jnp.asarray(mask)).astype(jnp.float32)
        iters = params.max_iters
        chunk = 1000

        def mk(variant, params=params, obst8=obst8, n_fluid=n_fluid,
               iters=iters, chunk=chunk):
            if variant == "v0":
                return jax.jit(
                    lambda f: resident.resident_run(
                        f, obst8 != 0, params, n_iters=iters, chunk=chunk
                    )
                )
            return jax.jit(
                lambda f: variant_run(
                    f, obst8, n_fluid, params, iters, chunk, variant
                )
            )

        runners[n] = {
            "params": params, "iters": iters,
            "variants": {v: mk(v) for v in args.variants},
        }

    # ----- correctness gates --------------------------------------------

    for n, cfg in runners.items():
        params = cfg["params"]
        f0 = reference.initial_state(params)
        ref_f, ref_av = None, None
        for v, fn in cfg["variants"].items():
            try:
                f, av = fn(reference.initial_state(params))
                f_h, av_h = np.asarray(f), np.asarray(av)
            except Exception as e:
                print(f"{n}^2 {v}: FAILED to run: {type(e).__name__}: {e}"[:300])
                cfg["variants"][v] = None
                continue
            if v == "v0":
                ref_f, ref_av = f_h, av_h
            else:
                ok_f = np.allclose(f_h, ref_f, rtol=1e-5, atol=1e-8)
                ok_a = np.allclose(av_h, ref_av, rtol=1e-5)
                bit = np.array_equal(f_h, ref_f)
                print(f"{n}^2 {v}: f {'bitwise' if bit else 'close' if ok_f else 'MISMATCH'}"
                      f" av {'ok' if ok_a else 'MISMATCH'}")
                if not (ok_f and ok_a):
                    cfg["variants"][v] = None

    # ----- timing: interleaved rounds -----------------------------------

    results = {}
    for r in range(args.rounds):
        for n, cfg in runners.items():
            params, iters = cfg["params"], cfg["iters"]
            for v, fn in cfg["variants"].items():
                if fn is None:
                    continue
                f0 = reference.initial_state(params)
                tic = time.perf_counter()
                f, av = fn(f0)
                av_h = np.asarray(av)
                f.block_until_ready()
                dt = time.perf_counter() - tic
                assert np.all(np.isfinite(av_h))
                results.setdefault((n, v), []).append(dt / iters * 1e6)
                print(f"round {r} {n}^2 {v}: {dt / iters * 1e6:.3f} us/step",
                      flush=True)

    print(f"\n{'grid':>6} {'variant':>8} {'us/step best':>13} {'median':>8} {'GLUPS':>7}")
    for (n, v), ts in sorted(results.items()):
        best = min(ts)
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:>5}^2 {v:>8} {best:13.3f} {med:8.3f} {n * n / best / 1e3:7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
