"""Headline benchmark: GLUPS at 1024x1024 on the available accelerator.

Prints ONE JSON line:
  {"metric": "GLUPS_1024x1024", "value": N, "unit": "GLUPS", "vs_baseline": N}

Baseline: the reference's best published 1024x1024 number — fused
timestep_new2, -Ofast, single Broadwell core: 20000 iters in 574.370 s
= 36.5 MLUPS (d2q9-bgk_1.out; BASELINE.md).  vs_baseline = ours / 0.0365.

Usage: python bench.py [--iters N] [--size NxN] [--backend fused|pallas]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_GLUPS = 0.0365  # reference optimized serial, 1024^2 (BASELINE.md)


def build_deck(nx: int, ny: int, max_iters: int):
    from advanced_hpc_lbm_tpu.params import LBMParams

    params = LBMParams(
        nx=nx, ny=ny, max_iters=max_iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    # the reference 1024x1024 geometry: closed box + interior vertical wall
    # at x=341 (obstacles_1024x1024.dat; SURVEY.md section 2)
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: ny // 2, min(nx - 1, nx // 3)] = True
    return params, mask


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", default="1024x1024")
    ap.add_argument(
        "--backend",
        default="best",
        choices=["best", "fused", "pallas", "resident"],
    )
    ap.add_argument(
        "--warmup",
        type=int,
        default=None,
        help="deprecated; warmup always runs the timed program once",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import fused, reference
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    nx, ny = (int(v) for v in args.size.split("x"))
    params, mask = build_deck(nx, ny, args.iters)
    obstacles = jnp.asarray(mask)

    backend = args.backend
    if backend == "best":
        try:
            from advanced_hpc_lbm_tpu.ops import pallas_step, resident

            if resident.supported(ny, nx):
                backend = "resident"
            elif pallas_step.supported(ny, nx):
                backend = "pallas"
            else:
                backend = "fused"
        except Exception:
            backend = "fused"

    if backend == "resident":
        from advanced_hpc_lbm_tpu.ops import resident

        def run(n):
            runner = jax.jit(
                lambda f, o: resident.resident_run(f, o, params, n_iters=n),
                donate_argnums=0,
            )
            f0 = reference.initial_state(params)
            f_final, av = runner(f0, obstacles)
            jax.block_until_ready((f_final, av))
            return av

    else:
        if backend == "pallas":
            from advanced_hpc_lbm_tpu.ops import pallas_step

            step_fn = pallas_step.pallas_fused_step
        else:
            step_fn = fused.fused_step

        def run(n):
            runner = jax.jit(
                lambda f, o: fused.run_simulation(
                    f, o, params, n_iters=n, step_fn=step_fn
                ),
                donate_argnums=0,
            )
            f0 = reference.initial_state(params)
            f_final, av = runner(f0, obstacles)
            jax.block_until_ready((f_final, av))
            return av

    # warm with the EXACT program that will be timed (a different iteration
    # count is a different scan length = a different executable; warming
    # with it would leave compilation inside the timed region)
    run(args.iters)
    tic = time.perf_counter()
    av = run(args.iters)
    elapsed = time.perf_counter() - tic

    assert bool(jnp.all(jnp.isfinite(av))), "NaN in av_vels during bench"
    glups = nx * ny * args.iters / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": f"GLUPS_{args.size}",
                "value": round(glups, 4),
                "unit": "GLUPS",
                "vs_baseline": round(glups / BASELINE_GLUPS, 1),
            }
        )
    )
    print(
        f"# backend={backend} iters={args.iters} elapsed={elapsed:.3f}s "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
