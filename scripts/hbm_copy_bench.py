#!/usr/bin/env python
"""Standalone HBM copy-bandwidth microbench (VERDICT round-2 item 2).

Pins down the large-footprint copy bound the biggrid probes observed
(~250-530 GB/s on 300-600 MB arrays vs ~430-880 GB/s on 37 MB ones):
is it a real device floor or a DMA-shape artifact?  Three experiments,
all in ONE process, interleaved (CLAUDE.md benchmarking rules):

  A. copy bandwidth vs ARRAY SIZE at fixed block shape (the original
     observation, now with the hidden scan-carry copy ruled out by the
     paired-call scan body and with a Pallas copy kernel whose operands
     are explicitly HBM-blocked, never VMEM-promoted);
  B. copy bandwidth vs BLOCK SHAPE (ty = rows per DMA'd block) at fixed
     large size — a shape artifact would move with ty;
  C. copy bandwidth of a FIXED 37 MB array while unrelated ballast
     arrays inflate total HBM residency — a footprint/fragmentation
     effect would degrade with ballast, a pure array-size effect won't.

Each measurement runs R copy pairs inside one jitted lax.scan (two
pallas calls per body — no in-place carry copy), so per-call dispatch
overhead (~58 ms through the tunnel) amortizes away.

Usage: python scripts/hbm_copy_bench.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--pairs", type=int, default=20,
                    help="copy pairs per timed scan")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    def make_copy(ny, nx, ty):
        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        return pl.pallas_call(
            kernel,
            grid=(ny // ty,),
            in_specs=[pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )

    def make_runner(ny, nx, ty, pairs):
        copy = make_copy(ny, nx, ty)

        def body(x, _):
            y = copy(x)
            x2 = copy(y)
            return x2, ()

        @jax.jit
        def run(x):
            x, _ = jax.lax.scan(body, x, None, length=pairs)
            return x

        return run

    def measure(run, x, pairs, nbytes):
        tic = time.perf_counter()
        out = run(x)
        np.asarray(out[0, 0, :8])  # pin completion through the tunnel
        dt = time.perf_counter() - tic
        # 2 copies per pair, each copy reads + writes nbytes
        return 2 * 2 * pairs * nbytes / dt / 1e9

    # ---- build configs --------------------------------------------------
    # A: size sweep at a fixed 64-row block (4x double-buffered in+out
    # blocks must fit the 100 MB scoped-VMEM limit: 4*36*ty*nx <= budget)
    sizes = [1024, 2048, 4096, 8192]
    # B: block-shape sweep at 4096^2 (ty=128 is the largest that fits)
    tys = [8, 32, 64, 128]
    # C: ballast sweep on the 1024^2 array
    ballasts = [0, 2, 6]  # x 600 MB

    runners = {}
    arrays = {}
    for n in sizes:
        nb = 9 * n * n * 4
        arrays[n] = jnp.ones((9, n, n), jnp.float32)
        ty = min(64, n, (100 * 2**20) // (4 * 36 * n) // 8 * 8)
        runners[("A", n)] = (make_runner(n, n, ty, args.pairs),
                             arrays[n], nb)
    for ty in tys:
        nb = 9 * 4096 * 4096 * 4
        runners[("B", ty)] = (make_runner(4096, 4096, ty, args.pairs),
                              arrays[4096], nb)

    ballast_arrays = []
    results = {}

    # warm every runner with its exact program
    for key, (run, x, nb) in runners.items():
        out = run(x)
        np.asarray(out[0, 0, :8])
        print(f"warmed {key}", flush=True)

    for r in range(args.rounds):
        for key, (run, x, nb) in runners.items():
            gbps = measure(run, x, args.pairs, nb)
            results.setdefault(key, []).append(gbps)
            print(f"round {r} {key}: {gbps:.1f} GB/s", flush=True)

    # C: same 1024^2 copy, growing ballast (monotone allocation; measure
    # AFTER each ballast step, interleaved rounds inside)
    run1024, x1024, nb1024 = runners[("A", 1024)]
    for nball in ballasts:
        while len(ballast_arrays) < nball:
            ballast_arrays.append(jnp.ones((9, 4096, 4096), jnp.float32))
        jax.block_until_ready(ballast_arrays) if ballast_arrays else None
        for r in range(args.rounds):
            gbps = measure(run1024, x1024, args.pairs, nb1024)
            results.setdefault(("C", nball), []).append(gbps)
            print(f"ballast {nball}x600MB round {r}: {gbps:.1f} GB/s",
                  flush=True)

    print(f"\n{'exp':>4} {'config':>8} {'GB/s best':>10} {'median':>8}")
    for key, vals in sorted(results.items()):
        best = max(vals)
        med = sorted(vals)[len(vals) // 2]
        print(f"{key[0]:>4} {key[1]:>8} {best:10.1f} {med:8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
