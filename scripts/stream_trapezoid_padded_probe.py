#!/usr/bin/env python
"""Interleaved A/B at the padded-native tiers (16384²+, small ty):
full-window stream step vs the static-slice trapezoid.

At 8192² (ty=64) the trapezoid LOST 3% — its unaligned sublane loads cost
~16% per row vs the 11% row savings (scripts/stream_trapezoid_probe.py,
2026-08-18).  The penalty model (1 - rowsave)*(1.16) predicts a ~6% win at
ty=32 (18.7% row savings) and ~10% at ty=24 (22.5%); this probe decides
pallas_stream.use_trapezoid's gate by measurement.

Timing methodology = scripts/stream_inplace_probe.py: one padded buffer at
a time (donated scan, re-init per run), av history materialized to host
inside the timed region, no full-state fetch.

Usage: python scripts/stream_trapezoid_padded_probe.py [--size 18432]
       [--iters 96] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=18432)
    ap.add_argument("--iters", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import build_deck
    from advanced_hpc_lbm_tpu.ops import pallas_stream
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = args.size
    params, mask = build_deck(n, n, args.iters)
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(obst == 0).astype(jnp.float32)
    obst_pad = pallas_stream.prepare_obstacles(obst)
    jax.block_until_ready(obst_pad)
    del obst, mask
    K = pallas_stream.K
    ty = pallas_stream._pick_tile_rows(n, n)
    print(f"ty={ty} T={ty + 2 * K} row-savings="
          f"{1 - (ty + 2 * K - K - 1) / (ty + 2 * K):.1%}", flush=True)

    fp_s = jax.ShapeDtypeStruct((9, n + 2 * K, n), jnp.float32)
    op_s = jax.ShapeDtypeStruct(obst_pad.shape, obst_pad.dtype)
    nf_s = jax.ShapeDtypeStruct((), jnp.float32)

    init_exe = jax.jit(
        lambda: pallas_stream.initial_state_padded(params)
    ).lower().compile()

    exes = {}
    for name, trap in (("full", False), ("trapezoid", True)):
        def scan_fn(fp, op, nf, _t=trap):
            return pallas_stream.run_padded(
                fp, op, nf, params, n_iters=args.iters, inplace=True,
                trapezoid=_t,
            )

        print(f"compiling {name}...", flush=True)
        t0 = time.perf_counter()
        exes[name] = (
            jax.jit(scan_fn, donate_argnums=0)
            .lower(fp_s, op_s, nf_s).compile()
        )
        print(f"  compiled in {time.perf_counter() - t0:.0f}s", flush=True)

    fp = None

    def timed(exe):
        nonlocal fp
        del fp  # previous buffer (donated or fresh) — one buffer at a time
        fp = init_exe()
        np.asarray(fp[0, 0, :8])  # true sync; absorbs first-transfer cost
        tic = time.perf_counter()
        fp, av = exe(fp, obst_pad, n_fluid)
        av_h = np.asarray(av)
        dt = time.perf_counter() - tic
        assert np.all(np.isfinite(av_h))
        return dt, av_h

    avs = {}
    for name, exe in exes.items():
        t, av = timed(exe)
        avs[name] = av
        print(f"warm {name}: {t:.1f}s", flush=True)
    print(
        "av histories bitwise equal:",
        bool(np.array_equal(avs["full"], avs["trapezoid"])),
        flush=True,
    )

    best: dict[str, float] = {}
    for rd in range(args.rounds):
        for name, exe in exes.items():
            dt, _ = timed(exe)
            us = dt / args.iters * 1e6
            best[name] = min(best.get(name, 1e18), us)
            print(
                f"round {rd} {name}: {us:.0f} us/step "
                f"({n * n / us / 1e3:.2f} GLUPS)",
                flush=True,
            )
    print("--- best ---", flush=True)
    for name, us in best.items():
        print(f"{name}: {us:.0f} us/step ({n * n / us / 1e3:.2f} GLUPS)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
