"""Interleaved size sweep of the VMEM-resident kernel (BENCH.md refresh).

Times the liveness-lean resident kernel at every supported square size in
one process (CLAUDE.md methodology), with the 1024^2 1-step Pallas kernel
interleaved as the cross-window anchor.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", default=["128", "256", "512", "1024"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--anchor", action="store_true", default=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import fused, pallas_step, reference, resident
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    iters_for = {"128": 40000, "256": 20000, "512": 8000, "1024": 2000}
    setups = {}
    for s in args.sizes:
        n = int(s)
        iters = iters_for.get(s, 2000)
        params = LBMParams(
            nx=n, ny=n, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.01, omega=1.85,
        )
        mask = np.zeros((n, n), dtype=bool)
        mask[0] = mask[-1] = True
        mask[:, 0] = mask[:, -1] = True
        mask[: n // 2, n // 3] = True
        obstacles = jnp.asarray(mask)
        assert resident.supported(n, n), f"resident unsupported at {s}"
        runner = jax.jit(
            lambda f, o, _p=params, _n=iters: resident.resident_run(
                f, o, _p, n_iters=_n
            )
        )
        setups[f"resident-{s}"] = (params, obstacles, runner, iters, n)

    if args.anchor:
        n, iters = 1024, 2000
        params = LBMParams(
            nx=n, ny=n, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.01, omega=1.85,
        )
        mask = np.zeros((n, n), dtype=bool)
        mask[0] = mask[-1] = True
        mask[:, 0] = mask[:, -1] = True
        mask[: n // 2, n // 3] = True
        runner = jax.jit(
            lambda f, o, _p=params, _n=iters: fused.run_simulation(
                f, o, _p, n_iters=_n, step_fn=pallas_step.pallas_fused_step
            )
        )
        setups["pallas-1024"] = (params, jnp.asarray(mask), runner, iters, n)

    def run_one(key):
        params, obstacles, runner, iters, _ = setups[key]
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        av_host = np.asarray(av)
        f_final.block_until_ready()
        assert np.all(np.isfinite(av_host))

    for key in setups:
        print(f"# warming {key} ...", flush=True)
        run_one(key)
    times = {key: [] for key in setups}
    for _ in range(args.repeats):
        for key in setups:
            t0 = time.perf_counter()
            run_one(key)
            times[key].append(time.perf_counter() - t0)

    for key in setups:
        iters, n = setups[key][3], setups[key][4]
        med = float(np.median(times[key]))
        best = float(np.min(times[key]))
        print(
            json.dumps(
                {
                    "config": key,
                    "us_per_step_med": round(med / iters * 1e6, 2),
                    "us_per_step_best": round(best / iters * 1e6, 2),
                    "glups_med": round(n * n * iters / med / 1e9, 2),
                    "glups_best": round(n * n * iters / best / 1e9, 2),
                    "ns_per_cell_best": round(best / iters / (n * n) * 1e9, 4),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
