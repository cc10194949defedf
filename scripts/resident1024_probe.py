"""Probe: VMEM-resident whole-run kernel at 1024^2 vs the 1-step kernel.

Round-2 follow-up to the 512^2 resident extension (BENCH.md): two 37.75 MB
state buffers + temporaries may fit under a raised scoped-VMEM limit
(v5e has 128 MiB).  Interleaved in one process per CLAUDE.md methodology;
cross-checks the av history between backends before timing.

Usage: python scripts/resident1024_probe.py [--iters N] [--repeats R]
       [--limit-mb M] [--chunk C]
"""

from __future__ import annotations

import argparse
import time
import traceback

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--limit-mb", type=int, default=127)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--size", default="1024x1024")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import fused, pallas_step, reference, resident
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    nx, ny = (int(v) for v in args.size.split("x"))
    params = LBMParams(
        nx=nx, ny=ny, max_iters=args.iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: ny // 2, nx // 3] = True
    obstacles = jnp.asarray(mask)

    # patch the resident caps for the experiment
    resident._MAX_BUFFER_BYTES = 9 * ny * nx * 4
    resident._VMEM_LIMIT_BYTES = args.limit_mb * 1024 * 1024
    resident._build_chunk_call.cache_clear()

    pallas_runner = jax.jit(
        lambda f, o, _n=args.iters: fused.run_simulation(
            f, o, params, n_iters=_n, step_fn=pallas_step.pallas_fused_step
        )
    )
    resident_runner = jax.jit(
        lambda f, o, _n=args.iters: resident.resident_run(
            f, o, params, n_iters=_n, chunk=args.chunk
        )
    )

    def run(runner):
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        av_host = np.asarray(av)
        f_final.block_until_ready()
        assert np.all(np.isfinite(av_host))
        return av_host

    print(f"# warming pallas 1-step {ny}x{nx} ...", flush=True)
    av_p = run(pallas_runner)
    print("# pallas warm OK", flush=True)

    print(
        f"# warming resident {ny}x{nx} "
        f"(buffer {9 * ny * nx * 4 / 1e6:.1f} MB, limit {args.limit_mb} MiB, "
        f"chunk {args.chunk}) ...",
        flush=True,
    )
    try:
        av_r = run(resident_runner)
    except Exception:
        traceback.print_exc()
        print("RESIDENT_COMPILE_OR_RUN_FAILED", flush=True)
        return 1
    print("# resident warm OK", flush=True)

    rel = np.abs(av_r - av_p) / np.maximum(np.abs(av_p), 1e-12)
    print(f"# av cross-check: max rel diff {rel.max():.3e}", flush=True)
    assert rel.max() < 1e-3, "resident diverges from pallas"

    times = {"pallas": [], "resident": []}
    for _ in range(args.repeats):
        for name, runner in (("pallas", pallas_runner), ("resident", resident_runner)):
            t0 = time.perf_counter()
            run(runner)
            times[name].append(time.perf_counter() - t0)

    for name, ts in times.items():
        med, best = float(np.median(ts)), float(np.min(ts))
        print(
            f"{name}: med {med / args.iters * 1e6:.1f} us/step "
            f"({nx * ny * args.iters / med / 1e9:.2f} GLUPS)  "
            f"best {best / args.iters * 1e6:.1f} us/step "
            f"({nx * ny * args.iters / best / 1e9:.2f} GLUPS)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
