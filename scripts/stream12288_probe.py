#!/usr/bin/env python
"""12288^2 on ONE chip via the streaming kernel (VERDICT round-2 item 8).

Two padded state buffers = 2 x 5.45 GB + 0.6 GB mask = ~11.5 GB of HBM —
under the 16 GB the auto-pipelined paths exceeded (their XLA transients
pushed past the limit; the streaming kernel has none).  Runs a short
amortized pass series and reports GLUPS + finiteness.

Usage: python scripts/stream12288_probe.py [--iters 128]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--size", type=int, default=12288)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import pallas_stream, reference
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = args.size
    params = LBMParams(
        nx=n, ny=n, max_iters=args.iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: n // 2, n // 3] = True
    obst = jnp.asarray(mask)
    ty = pallas_stream._pick_tile_rows(n, n)
    print(f"ty={ty} window={(ty or 0) + 2 * pallas_stream.K} rows", flush=True)

    # three-phase runner: the single-jit run() holds unpadded input + two
    # padded buffers and compile-OOMs HBM by 160 MB at 12288^2
    runner_split = pallas_stream.make_split_runner(
        obst, params, n_iters=args.iters
    )
    runner = lambda f, o: runner_split(f)
    del obst  # 0.14 GB on device: the runner holds its own padded mask
    f0 = reference.initial_state(params)
    tic = time.perf_counter()
    f, av = runner(f0, None)
    av_h = np.asarray(av)
    f.block_until_ready()
    warm = time.perf_counter() - tic
    assert np.all(np.isfinite(av_h)), "NaN during 12288^2 run"
    print(f"warm pass (incl. compile): {warm:.1f}s", flush=True)

    for r in range(3):
        del f  # 5.4 GB: free the last round's result before allocating
        f0 = reference.initial_state(params)
        tic = time.perf_counter()
        f, av = runner(f0, None)
        np.asarray(av)
        f.block_until_ready()
        dt = time.perf_counter() - tic
        us = dt / args.iters * 1e6
        print(f"round {r}: {us:.0f} us/step ({n * n / us / 1e3:.2f} GLUPS)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
