"""Interleaved size sweep of the 1-step Pallas kernel (BENCH.md size curve).

One process, all executables warmed first, then repeats interleaved across
sizes so device-window variance hits every config equally (CLAUDE.md
methodology).  Prints a table + one JSON line per size.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", default=["512", "1024", "2048", "4096"])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import fused, pallas_step, reference
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    from advanced_hpc_lbm_tpu.ops import pallas_k

    # iteration counts sized for ~0.2-0.5 s of work per timed run
    iters_for = {"512": 4000, "1024": 2000, "2048": 800, "4096": 300}
    setups = {}
    for s in args.sizes:
        n = int(s)
        params = LBMParams(
            nx=n, ny=n, max_iters=iters_for[s], reynolds_dim=10,
            density=0.1, accel=0.01, omega=1.85,
        )
        mask = np.zeros((n, n), dtype=bool)
        mask[0] = mask[-1] = True
        mask[:, 0] = mask[:, -1] = True
        obstacles = jnp.asarray(mask)
        iters = iters_for[s]
        # the auto policy: 1-step kernel at <= 1024^2, K-step above
        kk = pallas_k.best_k(n, n) if n * n > 1024 * 1024 else None
        if kk:
            runner = jax.jit(
                lambda f, o, _p=params, _n=iters, _k=kk: pallas_k.run(
                    f, o, _p, n_iters=_n, k=_k
                )
            )
        else:
            runner = jax.jit(
                lambda f, o, _p=params, _n=iters: fused.run_simulation(
                    f, o, _p, n_iters=_n, step_fn=pallas_step.pallas_fused_step
                )
            )
        setups[s] = (params, obstacles, runner, iters, kk)
        print(f"# {s}: ty={pallas_step._pick_tile_rows(n, n)} k={kk}")

    def run_one(s):
        params, obstacles, runner, iters, _ = setups[s]
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        av_host = np.asarray(av)
        f_final.block_until_ready()
        assert np.all(np.isfinite(av_host))
        return av_host

    for s in setups:  # warm exact executables
        run_one(s)
    times = {s: [] for s in setups}
    for _ in range(args.repeats):
        for s in setups:
            t0 = time.perf_counter()
            run_one(s)
            times[s].append(time.perf_counter() - t0)

    for s in setups:
        n = int(s)
        iters, kk = setups[s][3], setups[s][4]
        med = float(np.median(times[s]))
        best = float(np.min(times[s]))
        glups = n * n * iters / med / 1e9
        glups_best = n * n * iters / best / 1e9
        print(
            json.dumps(
                {
                    "metric": f"GLUPS_{s}x{s}",
                    "value": round(glups, 3),
                    "best": round(glups_best, 3),
                    "us_per_step": round(med / iters * 1e6, 2),
                    "ns_per_cell": round(med / iters / (n * n) * 1e9, 4),
                    "backend": f"pallask-k{kk}" if kk else "pallas",
                }
            )
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
