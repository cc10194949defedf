"""A/B probe: liveness-lean K-step kernel vs the naive value-list kernel.

Interleaved in one process at the HBM-bound sizes (2048^2, 4096^2), a K
sweep per size.  Cross-checks av histories between variants first.

Usage: python scripts/pallask_lean_probe.py [--size 2048x2048] [--ks 4 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="2048x2048")
    ap.add_argument("--ks", nargs="*", type=int, default=[4, 8])
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import pallas_k, reference
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

    runners = {}
    for k in args.ks:
        if not pallas_k.supported(ny, nx, k):
            print(f"# k={k} unsupported at {args.size}, skipping", flush=True)
            continue
        for lean in (False, True):
            name = f"k{k}-{'lean' if lean else 'naive'}"
            runners[name] = jax.jit(
                lambda f, o, _n=args.iters, _k=k, _l=lean: pallas_k.run(
                    f, o, params, n_iters=_n, k=_k, lean=_l
                )
            )

    def run(runner):
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        av_host = np.asarray(av)
        f_final.block_until_ready()
        assert np.all(np.isfinite(av_host))
        return av_host

    avs = {}
    for name, runner in runners.items():
        print(f"# warming {name} ...", flush=True)
        avs[name] = run(runner)
    for k in args.ks:
        a, b = avs.get(f"k{k}-naive"), avs.get(f"k{k}-lean")
        if a is None or b is None:
            continue
        rel = np.abs(b - a) / np.maximum(np.abs(a), 1e-12)
        print(f"# k={k} naive-vs-lean max rel diff {rel.max():.3e}", flush=True)
        assert rel.max() < 1e-4, "lean diverges from naive"

    times = {name: [] for name in runners}
    for _ in range(args.repeats):
        for name, runner in runners.items():
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
