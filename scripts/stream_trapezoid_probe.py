#!/usr/bin/env python
"""Interleaved A/B: full-window stream kernel vs the static-slice
trapezoid step (kernel_common.lean_window_step_rows) at the stream tiers.

The trapezoid computes K*(T-K-1) rows per pass vs K*T for the wrap-garbage
form — an 11% VPU cut at 8192^2 (ty=64), 14% at 16384^2 (ty=32), 23% at
18432^2 (ty=24) — and replaces the y-roll with static unaligned sublane
slices, whose Mosaic cost is the open question this probe answers
(VERDICT round-3 item 4).  Own rows are bitwise-identical by construction
(tests/test_stream.py trapezoid equivalence).

Same process, long calls, N interleaved rounds — the only trusted ratio
form on this shared chip (CLAUDE.md).

Usage: python scripts/stream_trapezoid_probe.py [--size 8192] [--iters 400]
       [--rounds 3]
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
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import build_deck  # canonical bench geometry
    from advanced_hpc_lbm_tpu.ops import pallas_stream, reference
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = args.size
    params, mask = build_deck(n, n, args.iters)
    obst = jnp.asarray(mask)

    runners = {
        "full": jax.jit(
            lambda f, o: pallas_stream.run(
                f, o, params, n_iters=args.iters, inplace=True
            ),
            donate_argnums=0,
        ),
        "trapezoid": jax.jit(
            lambda f, o: pallas_stream.run(
                f, o, params, n_iters=args.iters, inplace=True,
                trapezoid=True,
            ),
            donate_argnums=0,
        ),
    }

    def timed(fn):
        f0 = reference.initial_state(params)
        tic = time.perf_counter()
        f, av = fn(f0, obst)
        av_h = np.asarray(av)
        np.asarray(f[0, :1, :128])  # true sync through the relay
        dt = time.perf_counter() - tic
        assert np.all(np.isfinite(av_h))
        del f
        return dt, av_h

    avs = {}
    for name, fn in runners.items():
        print(f"warming {name}...", flush=True)
        t, av = timed(fn)
        avs[name] = av
        print(f"  warm (incl compile): {t:.1f}s", flush=True)
    # same deck, same schedule: the two step forms must agree bitwise
    same = bool(np.array_equal(avs["full"], avs["trapezoid"]))
    print(f"av histories bitwise equal: {same}", flush=True)

    best: dict[str, float] = {}
    for r in range(args.rounds):
        for name, fn in runners.items():
            dt, _ = timed(fn)
            us = dt / args.iters * 1e6
            best[name] = min(best.get(name, 1e18), us)
            print(
                f"round {r} {name}: {us:.0f} us/step "
                f"({n * n / us / 1e3:.2f} GLUPS)",
                flush=True,
            )
    print("--- best ---")
    for name, us in best.items():
        print(f"{name}: {us:.0f} us/step ({n * n / us / 1e3:.2f} GLUPS)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
