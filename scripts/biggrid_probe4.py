"""Probe 4: does the HBM row pitch (nx*4) cause the big-grid DMA falloff?

Same total bytes (9 x 16M cells), interleaved:

  wide      (9, 4096, 4096)   pitch 16 KB   block (9, 16, 4096)
  tall      (9, 16384, 1024)  pitch  4 KB   block (9, 64, 1024)
  mid       (9, 8192, 2048)   pitch  8 KB   block (9, 32, 2048)
  wide-ty64 (9, 4096, 4096)   pitch 16 KB   block (9, 64, 4096) grid 2-D
            (x-split so the bigger ty fits VMEM: block (9, 64, 1024))
  small     (9, 1024, 1024)   pitch  4 KB   block (9, 64, 1024) [footprint ctl]
"""

from __future__ import annotations

import functools
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    def copy_kernel(f_ref, out_ref):
        for k in range(9):
            out_ref[k] = f_ref[k]

    @functools.lru_cache(maxsize=32)
    def build(label, shape, block, steps):
        ny, nx = shape[1], shape[2]
        ty, tx = block[1], block[2]
        if tx != nx:
            grid = (ny // ty, nx // tx)
            spec = pl.BlockSpec((9, ty, tx), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM)
        else:
            grid = (ny // ty,)
            spec = pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            copy_kernel, grid=grid, in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(np.prod(shape)),
                bytes_accessed=int(8 * np.prod(shape)),
                transcendentals=0,
            ),
        )

        def many(f):
            def body(c, _):
                return call(c), None

            out, _ = jax.lax.scan(body, f, None, length=steps)
            return out, jnp.sum(out[:, 0, :1])

        return jax.jit(many, donate_argnums=0), shape, steps

    configs = [
        ("wide", (9, 4096, 4096), (9, 16, 4096), 25),
        ("tall", (9, 16384, 1024), (9, 64, 1024), 25),
        ("mid", (9, 8192, 2048), (9, 32, 2048), 25),
        ("wide-ty64", (9, 4096, 4096), (9, 64, 1024), 25),
        ("small", (9, 1024, 1024), (9, 64, 1024), 400),
    ]
    fns = {c[0]: build(*c) for c in configs}

    def run_one(label):
        fn, shape, steps = fns[label]
        f = jnp.full(shape, 0.1, jnp.float32)
        out, s = fn(f)
        return np.asarray(s)

    for label in fns:
        run_one(label)
    times = {k: [] for k in fns}
    for _ in range(8):
        for label in fns:
            t0 = time.perf_counter()
            run_one(label)
            times[label].append(time.perf_counter() - t0)

    print(f"{'label':10} {'cells':>10} {'best us/st':>10} {'med us/st':>10} {'best GB/s':>9}")
    for label, ts in times.items():
        fn, shape, steps = fns[label]
        nbytes = int(np.prod(shape)) * 4
        best = float(np.min(ts)) / steps
        med = float(np.median(ts)) / steps
        print(f"{label:10} {np.prod(shape[1:]):>10} {best*1e6:>10.1f}"
              f" {med*1e6:>10.1f} {2*nbytes/best/1e9:>9.0f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
