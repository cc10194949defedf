#!/usr/bin/env python
"""Huge-grid single-buffer probe: the in-place streaming kernel
(input_output_aliases) scanned in ONE jit, padded-native init, plane-wise
fetch — the schedule that holds a single padded state buffer end to end.

Targets the tier beyond make_split_runner: 12288^2 (5.07 GiB state,
baseline comparison vs the split runner) and 16384^2 / 18432^2 (9.7 /
12.2 GiB — impossible with two buffers on a 15.7 GiB chip).

Usage: python scripts/stream_inplace_probe.py [--size 12288] [--iters 128]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--size", type=int, default=12288)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)
    if args.iters % 8:
        raise SystemExit("--iters must be a multiple of K=8")

    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import pallas_stream
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = args.size
    params = LBMParams(
        nx=n, ny=n, max_iters=args.iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: n // 2, n // 3] = True
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(obst == 0).astype(jnp.float32)
    obst_pad = pallas_stream.prepare_obstacles(obst)
    jax.block_until_ready(obst_pad)
    del obst, mask
    ty = pallas_stream._pick_tile_rows(n, n)
    state_gib = 9 * (n + 16) * n * 4 / 2**30
    log(f"ty={ty} padded state {state_gib:.2f} GiB (ONE buffer)")

    K = pallas_stream.K
    fp_s = jax.ShapeDtypeStruct((9, n + 2 * K, n), jnp.float32)
    op_s = jax.ShapeDtypeStruct(obst_pad.shape, obst_pad.dtype)
    nf_s = jax.ShapeDtypeStruct((), jnp.float32)

    init_exe = jax.jit(
        lambda: pallas_stream.initial_state_padded(params)
    ).lower().compile()

    def scan_fn(fp, op, nf):
        return pallas_stream.run_padded(
            fp, op, nf, params, n_iters=args.iters, inplace=True
        )

    log("compiling in-place scan...")
    t0 = time.perf_counter()
    scan_exe = (
        jax.jit(scan_fn, donate_argnums=0).lower(fp_s, op_s, nf_s).compile()
    )
    log(f"compiled in {time.perf_counter() - t0:.0f}s")
    try:
        m = scan_exe.memory_analysis()
        log(
            f"memory_analysis: args={m.argument_size_in_bytes/2**30:.3f}G "
            f"out={m.output_size_in_bytes/2**30:.3f}G "
            f"temp={m.temp_size_in_bytes/2**30:.3f}G "
            f"alias={m.alias_size_in_bytes/2**30:.3f}G"
        )
    except Exception as e:
        log(f"memory_analysis unavailable: {e}")

    fp = init_exe()
    np.asarray(fp[0, 0, :8])  # sync init + absorb first-transfer cost
    log("padded init ready")

    tic = time.perf_counter()
    fp, av = scan_exe(fp, obst_pad, n_fluid)
    av_h = np.asarray(av)
    log(f"warm pass: {time.perf_counter() - tic:.1f}s")
    assert np.all(np.isfinite(av_h)), "NaN during in-place run"
    log(f"av[0]={av_h[0]:.6e} av[-1]={av_h[-1]:.6e}")

    for r in range(args.repeats):
        # fp was donated; re-init (also in place of the freed buffer)
        del fp
        fp = init_exe()
        np.asarray(fp[0, 0, :8])
        tic = time.perf_counter()
        fp, av = scan_exe(fp, obst_pad, n_fluid)
        np.asarray(av)
        dt = time.perf_counter() - tic
        us = dt / args.iters * 1e6
        log(
            f"round {r}: {us:.0f} us/step ({n * n / us / 1e3:.2f} GLUPS)"
        )

    # plane-wise fetch: never materializes the full unpadded state on
    # device next to the padded buffer
    s = 0.0
    for c in range(9):
        s += float(np.asarray(fp[c, K : K + 8, :128]).sum())
    log(f"done; corner checksum {s:.6e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
