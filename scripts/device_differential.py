"""On-device cross-backend differential — the anti-miscompile gate.

The hermetic suite proves kernel==oracle in interpret mode (a Mosaic
*semantics* check); this script runs the real compiled kernels on the
attached TPU and cross-checks their av histories and final states, so a
Mosaic/XLA miscompile that interpret mode can't see would be caught.

Runs a random-geometry 256x256 deck N steps through fused / pallas /
pallask / resident on device and reports pairwise max rel diffs.

Measured structure (2026-08-17, 2000 steps): the three Mosaic kernels
(pallas / pallask / resident) are BITWISE-IDENTICAL on the final state
and ~3e-7 on av (they share kernel_common's exact fp op order); the
XLA-fused jnp path drifts ~1.2e-3 on av / ~8e-5 on f against them —
fp-reassociation accumulation over a sensitive trajectory, the same
scale at which all backends differ from the C reference's goldens
(0.06-0.24% of the checker's 1% tolerance).  The gate is therefore set
at half the checker tolerance.

Usage: python scripts/device_differential.py [--size 256x256] [--iters 2000]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x256")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import (
        fused, pallas_k, pallas_step, reference, resident,
    )
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    nx, ny = (int(v) for v in args.size.split("x"))
    params = LBMParams(
        nx=nx, ny=ny, max_iters=args.iters, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(args.seed)
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    for _ in range(24):
        mask[rng.randint(1, ny - 1), rng.randint(0, nx)] = True
    obst = jnp.asarray(mask)

    runners = {
        "fused": jax.jit(
            lambda f, o: fused.run_simulation(f, o, params, n_iters=args.iters)
        ),
        "pallas": jax.jit(
            lambda f, o: fused.run_simulation(
                f, o, params, n_iters=args.iters,
                step_fn=pallas_step.pallas_fused_step,
            )
        ),
    }
    kk = pallas_k.best_k(ny, nx)
    if kk is not None:
        runners["pallask"] = jax.jit(
            lambda f, o: pallas_k.run(f, o, params, n_iters=args.iters, k=kk)
        )
    if resident.supported(ny, nx):
        runners["resident"] = jax.jit(
            lambda f, o: resident.resident_run(f, o, params, n_iters=args.iters)
        )

    outs = {}
    for name, fn in runners.items():
        f, av = fn(reference.initial_state(params), obst)
        outs[name] = (np.asarray(f), np.asarray(av))
        print(f"# ran {name}", flush=True)

    names = list(outs)
    worst_av = worst_f = 0.0
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            fa, ava = outs[a]
            fb, avb = outs[b]
            rel_av = float(np.max(np.abs(avb - ava) / np.maximum(np.abs(ava), 1e-12)))
            rel_f = float(np.max(np.abs(fb - fa) / np.maximum(np.abs(fa), 1e-12)))
            worst_av, worst_f = max(worst_av, rel_av), max(worst_f, rel_f)
            print(f"{a:9s} vs {b:9s}: av max rel {rel_av:.3e}  f max rel {rel_f:.3e}")
    # half the reference checker's 1% contract (check.py:21); kernels
    # additionally must be mutually near-exact (shared fp op order)
    kernel_names = [n for n in names if n != "fused"]
    kernel_worst = 0.0
    for i, a in enumerate(kernel_names):
        for b in kernel_names[i + 1:]:
            kernel_worst = max(
                kernel_worst,
                float(np.max(np.abs(outs[b][1] - outs[a][1])
                             / np.maximum(np.abs(outs[a][1]), 1e-12))),
            )
    ok = worst_av < 5e-3 and worst_f < 5e-3 and kernel_worst < 1e-5
    print(
        f"{'PASS' if ok else 'FAIL'}: worst av {worst_av:.3e}, worst f "
        f"{worst_f:.3e}, kernel-vs-kernel av {kernel_worst:.3e}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
