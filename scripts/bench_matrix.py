#!/usr/bin/env python
"""Reproduce the reference's performance table (SURVEY.md section 6) on
this engine: per-deck wall-clock + MLUPS, plus synthetic scale-up sizes.

Prints one JSON line per config (same schema as bench.py) and a summary
table.  Usage: python scripts/bench_matrix.py [--configs ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# (label, nx, ny, iters, accel) — deck iters mirror the input_*.params
CONFIGS = [
    ("128x128", 128, 128, 40000, 0.005),
    ("128x256", 128, 256, 40000, 0.005),
    ("256x256", 256, 256, 80000, 0.005),
    ("1024x1024", 1024, 1024, 20000, 0.01),
    ("4096x4096", 4096, 4096, 1000, 0.01),
]
# reference optimized serial MLUPS at 1024^2 (BASELINE.md)
BASELINE_GLUPS = 0.0365


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=[c[0] for c in CONFIGS])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.models.d2q9_bgk import Simulation
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    rows = []
    for label, nx, ny, iters, accel in CONFIGS:
        if label not in args.configs:
            continue
        params = LBMParams(
            nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=accel, omega=1.85,
        )
        mask = np.zeros((ny, nx), dtype=bool)
        mask[0] = mask[-1] = True
        mask[:, 0] = mask[:, -1] = True
        sim = Simulation(params, mask)
        sim.run(n_iters=min(iters, 100))  # compile small segment? no: warm full below
        tic = time.time()
        res = sim.run()
        warm_hint = time.time() - tic  # includes first full-length compile
        tic = time.time()
        res = sim.run()
        elapsed = time.time() - tic
        glups = nx * ny * iters / elapsed / 1e9
        rows.append((label, sim.backend, iters, elapsed, glups))
        print(
            json.dumps(
                {
                    "metric": f"GLUPS_{label}",
                    "value": round(glups, 4),
                    "unit": "GLUPS",
                    "vs_baseline": round(glups / BASELINE_GLUPS, 1),
                }
            ),
            flush=True,
        )
        del warm_hint, res

    print(f"\n{'config':>11} {'backend':>9} {'iters':>7} {'seconds':>9} {'GLUPS':>7}")
    for label, backend, iters, elapsed, glups in rows:
        print(f"{label:>11} {backend:>9} {iters:>7} {elapsed:9.3f} {glups:7.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
