#!/usr/bin/env python
"""Big-grid pallask joint K/ty re-sweep at a raised VMEM limit
(VERDICT round-2 item 2, the "bigger-ty lever", DESIGN.md:259-261).

ty=128 tiles were blocked by the 100 MB scoped-VMEM limit; the resident
kernel runs at 127 MiB, so probe the K-step kernel there: seam recompute
is 2K/ty, so ty=128 at K=6/8 cuts it to 9.4/12.5% (vs 18.75% for the
shipped K=6 ty=64 at 4096^2).  All configs interleaved in ONE process,
full-length amortized calls, min-of-rounds.

Usage: python scripts/pallask_ty128_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ["LBM_PALLASK_VMEM_MB"] = "127"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import pallas_k, pallas_stream, reference
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    # (n, k, ty, iters) — first entry per size is the shipped config;
    # k="stream" is the manual-DMA streaming kernel (ops.pallas_stream,
    # K=8 fixed, ty auto)
    # the ty-raised pallask configs are measured-dead (fail to compile
    # even at 127 MiB — BENCH.md round 3); stream vs shipped per size
    configs = [
        (2048, 4, 128, 4000),
        (2048, "stream", 0, 4000),
        (4096, 6, 64, 1200),
        (4096, "stream", 0, 1200),
        (8192, 6, 32, 400),
        (8192, "stream", 0, 400),
    ]

    compiled = {}
    decks = {}
    for n, k, ty, iters in configs:
        if n not in decks:
            params = LBMParams(
                nx=n, ny=n, max_iters=iters, reynolds_dim=10,
                density=0.1, accel=0.01, omega=1.85,
            )
            mask = np.zeros((n, n), dtype=bool)
            mask[0] = mask[-1] = True
            mask[:, 0] = mask[:, -1] = True
            mask[: n // 2, n // 3] = True
            decks[n] = (params, jnp.asarray(mask))
        params, obst = decks[n]
        if k == "stream":
            runner = jax.jit(
                lambda f, o, p=params, nn=iters: pallas_stream.run(
                    f, o, p, n_iters=nn
                )
            )
        else:
            os.environ["LBM_PALLASK_TY"] = str(ty)
            runner = jax.jit(
                lambda f, o, p=params, nn=iters, kk=k: pallas_k.run(
                    f, o, p, n_iters=nn, k=kk
                )
            )
        f_s = jax.ShapeDtypeStruct((9, n, n), jnp.float32)
        o_s = jax.ShapeDtypeStruct((n, n), jnp.bool_)
        try:
            # trace+compile NOW so the ty env override is frozen into
            # this program (the env var is read at trace time)
            exe = runner.lower(f_s, o_s).compile()
        except Exception as e:
            print(f"{n}^2 K={k} ty={ty}: compile FAILED: "
                  f"{type(e).__name__}: {e}"[:300], flush=True)
            continue
        compiled[(n, k, ty)] = (exe, iters)
        print(f"compiled {n}^2 K={k} ty={ty}", flush=True)
    os.environ.pop("LBM_PALLASK_TY", None)

    # warm each with its exact program (and one full host fetch)
    avs_ref = {}
    for (n, k, ty), (exe, iters) in compiled.items():
        params, obst = decks[n]
        f0 = reference.initial_state(params)
        f, av = exe(f0, obst)
        av_h = np.asarray(av)
        f.block_until_ready()
        assert np.all(np.isfinite(av_h)), (n, k, ty)
        # cross-config correctness: av trajectories must agree per size
        if n in avs_ref:
            assert np.allclose(av_h, avs_ref[n], rtol=1e-4), (n, k, ty)
        else:
            avs_ref[n] = av_h
        print(f"warmed {n}^2 K={k} ty={ty}", flush=True)

    results = {}
    for r in range(3):
        for (n, k, ty), (exe, iters) in compiled.items():
            params, obst = decks[n]
            f0 = reference.initial_state(params)
            tic = time.perf_counter()
            f, av = exe(f0, obst)
            np.asarray(av)
            f.block_until_ready()
            dt = time.perf_counter() - tic
            us = dt / iters * 1e6
            results.setdefault((n, k, ty), []).append(us)
            print(f"round {r} {n}^2 K={k} ty={ty}: {us:.1f} us/step "
                  f"({n * n / us / 1e3:.2f} GLUPS)", flush=True)

    print(f"\n{'grid':>6} {'K':>3} {'ty':>4} {'us/step best':>13} "
          f"{'median':>8} {'GLUPS':>7}")
    for (n, k, ty), ts in sorted(results.items(), key=lambda kv: (kv[0][0], str(kv[0][1]), kv[0][2])):
        best = min(ts)
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:>5}^2 {k:>3} {ty:>4} {best:13.1f} {med:8.1f} "
              f"{n * n / best / 1e3:7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
