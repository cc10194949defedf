#!/usr/bin/env python
"""Three-way interleaved 8192^2 comparison: shipped pallask (K=6 ty=32)
vs two-buffer stream vs IN-PLACE stream (one 2.26 GiB buffer).

Round-3 context: stream beat pallask 16.26 vs 16.00 same-process; the
in-place schedule adds a deferred egress start (one extra sync per tile)
but halves HBM footprint.  Same process, long 400-step calls, N rounds
interleaved — the only trusted ratio form on this shared chip.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import build_deck  # canonical bench geometry — keep in lockstep
    from advanced_hpc_lbm_tpu.ops import pallas_k, pallas_stream, reference
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = 8192
    params, mask = build_deck(n, n, args.iters)
    obst = jnp.asarray(mask)

    runners = {
        "pallask6": jax.jit(
            lambda f, o: pallas_k.run(f, o, params, n_iters=args.iters, k=6)
        ),
        "stream2buf": jax.jit(
            lambda f, o: pallas_stream.run(f, o, params, n_iters=args.iters)
        ),
        "inplace": jax.jit(
            lambda f, o: pallas_stream.run(
                f, o, params, n_iters=args.iters, inplace=True
            )
        ),
    }

    def timed(fn):
        f0 = reference.initial_state(params)
        tic = time.perf_counter()
        f, av = fn(f0, obst)
        np.asarray(av)
        f.block_until_ready()
        dt = time.perf_counter() - tic
        del f
        return dt

    for name, fn in runners.items():
        print(f"warming {name}...", flush=True)
        t = timed(fn)
        print(f"  warm (incl compile): {t:.1f}s", flush=True)

    best: dict[str, float] = {}
    for r in range(args.rounds):
        for name, fn in runners.items():
            dt = timed(fn)
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
