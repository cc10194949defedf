"""Isolate the per-call dispatch cost from the per-step kernel rate.

Times the VMEM-resident 1024^2 kernel in 48- vs 480- vs 4800-step calls,
interleaved, with EQUAL TOTAL STEPS per variant — so any difference in
us/step is pure per-call overhead.  Measured (2026-08-17): wall fits
``~58 ms/call + ~34-46 us/step`` in that window; the fixed cost is the
device-tunnel dispatch/round-trip, and it varies by window (can drop to
~ms).  Consequence: benchmark with long calls (bench.py defaults to the
full 20 000-step deck) or the kernel is under-read by up to 2x.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--lengths", nargs="*", type=int, default=[48, 480, 4800])
    ap.add_argument("--total-steps", type=int, default=14400)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import reference, resident
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = args.size
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    obst = jnp.asarray(mask)

    runners = {}
    for steps in args.lengths:
        params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
        runners[steps] = (
            params,
            jax.jit(
                lambda f, o, _p=params, _s=steps: resident.resident_run(
                    f, o, _p, n_iters=_s
                )
            ),
        )
    for steps, (params, fn) in runners.items():
        f, av = fn(reference.initial_state(params), obst)
        np.asarray(av)
        f.block_until_ready()

    times = {s: [] for s in runners}
    for _ in range(args.repeats):
        for steps, (params, fn) in runners.items():
            reps = max(1, args.total_steps // steps)
            t0 = time.perf_counter()
            for _ in range(reps):
                f, av = fn(reference.initial_state(params), obst)
                np.asarray(av)
                f.block_until_ready()
            times[steps].append(
                (time.perf_counter() - t0) / (reps * steps) * 1e6
            )
    for steps, ts in times.items():
        print(
            f"resident {steps:5d}-step calls: {min(ts):.2f} us/step best, "
            f"med {sorted(ts)[len(ts) // 2]:.2f}"
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
