#!/usr/bin/env python
"""Phase-by-phase replay of make_split_runner at 12288^2 with a blocking
print after every step, to localize the ResourceExhausted (round 3).

RESULT (2026-08-17, kept as the measurement record): completed — first
12288^2 run on one chip.  Two findings this replay isolated:
* memory_analysis of the donated K-pass jit: alias=5.07G AND
  temp=5.07G — XLA satisfies padded->padded donation by writing the
  kernel output to a full-state temp then copying into the param's
  buffer (peak still 2 buffers, but a ~10 GB/pass hidden copy); the
  shipped runner therefore does NOT donate the pass (see
  pallas_stream.make_split_runner).
* serialization through the axon relay requires a REAL host
  materialization (np.asarray of the tiny av): block_until_ready
  returned without waiting, so the dispatch loop ran ahead and the
  eagerly-allocated outputs OOM'd HBM (stream12288e/f/g probes)."""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import pallas_stream, reference
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = 12288
    n_iters = 32  # 4 single passes, no tail
    params = LBMParams(
        nx=n, ny=n, max_iters=n_iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: n // 2, n // 3] = True
    obst = jnp.asarray(mask)
    log("obstacles on device")

    n_fluid = jnp.sum(obst == 0).astype(jnp.float32)
    obst_pad = pallas_stream.prepare_obstacles(obst)
    jax.block_until_ready(obst_pad)
    log(f"obst_pad ready {obst_pad.shape} {obst_pad.dtype}")
    del obst  # probe holds only what the runner needs

    K = pallas_stream.K
    f0_s = jax.ShapeDtypeStruct((9, n, n), jnp.float32)
    fp_s = jax.ShapeDtypeStruct((9, n + 2 * K, n), jnp.float32)
    op_s = jax.ShapeDtypeStruct(obst_pad.shape, obst_pad.dtype)
    nf_s = jax.ShapeDtypeStruct((), jnp.float32)

    log("compiling pad...")
    pad_exe = (
        jax.jit(pallas_stream.pad_state, donate_argnums=0)
        .lower(f0_s)
        .compile()
    )
    log("pad compiled; compiling single pass...")

    def single_pass(fp, op, nf):
        return pallas_stream.multi_step_padded(fp, op, nf, params)

    single_exe = (
        jax.jit(single_pass, donate_argnums=0)
        .lower(fp_s, op_s, nf_s)
        .compile()
    )
    log("single pass compiled")
    try:
        mem = single_exe.memory_analysis()
        log(
            f"memory_analysis: args={mem.argument_size_in_bytes/2**30:.3f}G "
            f"out={mem.output_size_in_bytes/2**30:.3f}G "
            f"temp={mem.temp_size_in_bytes/2**30:.3f}G "
            f"alias={mem.alias_size_in_bytes/2**30:.3f}G "
            f"gen={mem.generated_code_size_in_bytes/2**20:.1f}M"
        )
    except Exception as e:
        log(f"memory_analysis unavailable: {e}")

    f0 = reference.initial_state(params)
    jax.block_until_ready(f0)
    log("f0 ready")
    fp = pad_exe(f0)
    jax.block_until_ready(fp)
    del f0
    log("pad executed")

    for i in range(n_iters // K):
        fp, av = single_exe(fp, obst_pad, n_fluid)
        jax.block_until_ready(fp)
        log(f"pass {i}: av={np.asarray(av)[-1]:.6e}")

    f = fp[:, K:-K, :]
    checksum = float(jnp.sum(f[0, :8, :128]))
    log(f"done; corner checksum {checksum:.6e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
