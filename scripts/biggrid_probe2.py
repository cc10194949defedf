"""Probe 2: is the big-grid DMA falloff caused by the 9-plane strided
gather (plane stride = ny*nx*4 grows with the grid), by the lane width, or
by total footprint?

Interleaved copy kernels, all ~identical block bytes (~2.4 MB):

  planes-1024  (9,1024,1024)  block (9,64,1024)   9 chunks, 4 MB stride
  planes-2048  (9,2048,2048)  block (9,32,2048)   9 chunks, 16 MB stride
  planes-4096  (9,4096,4096)  block (9,16,4096)   9 chunks, 64 MB stride
  flat-1024    (9216,1024)    block (576,1024)    1 contiguous chunk
  flat-2048    (18432,2048)   block (288,2048)    1 contiguous chunk
  flat-4096    (36864,4096)   block (144,4096)    1 contiguous chunk
  xsplit-2048  (9,2048,2048)  block (9,32,1024) 2-D grid — halves chunk len
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

    def copy3(f_ref, out_ref):
        for k in range(9):
            out_ref[k] = f_ref[k]

    def copy2(f_ref, out_ref):
        out_ref[...] = f_ref[...]

    @functools.lru_cache(maxsize=32)
    def build(label, shape, block, steps):
        vm = pltpu.VMEM
        if len(shape) == 3:
            ny = shape[1]
            ty = block[1]
            if len(block) == 3 and block[2] != shape[2]:  # x-split 2-D grid
                tx = block[2]
                grid = (ny // ty, shape[2] // tx)
                spec = pl.BlockSpec((9, ty, tx), lambda i, j: (0, i, j),
                                    memory_space=vm)
            else:
                grid = (ny // ty,)
                spec = pl.BlockSpec((9, ty, shape[2]), lambda i: (0, i, 0),
                                    memory_space=vm)
            kern = copy3
        else:
            ty = block[0]
            grid = (shape[0] // ty,)
            spec = pl.BlockSpec((ty, shape[1]), lambda i: (i, 0),
                                memory_space=vm)
            kern = copy2
        call = pl.pallas_call(
            kern, grid=grid, in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )

        def many(f):
            def body(c, _):
                return call(c), None

            out, _ = jax.lax.scan(body, f, None, length=steps)
            return jnp.sum(out.reshape(-1)[:8])

        return jax.jit(many, donate_argnums=0), shape, steps

    configs = [
        ("planes-1024", (9, 1024, 1024), (9, 64, 1024), 100),
        ("planes-2048", (9, 2048, 2048), (9, 32, 2048), 30),
        ("planes-4096", (9, 4096, 4096), (9, 16, 4096), 10),
        ("flat-1024", (9 * 1024, 1024), (576, 1024), 100),
        ("flat-2048", (9 * 2048, 2048), (288, 2048), 30),
        ("flat-4096", (9 * 4096, 4096), (144, 4096), 10),
        ("xsplit-2048", (9, 2048, 2048), (9, 32, 1024), 30),
    ]
    fns = {c[0]: build(*c) for c in configs}

    def run_one(label):
        fn, shape, steps = fns[label]
        f = jnp.full(shape, 0.1, jnp.float32)
        return np.asarray(fn(f))

    for label in fns:
        run_one(label)
    times = {k: [] for k in fns}
    for _ in range(5):
        for label in fns:
            t0 = time.perf_counter()
            run_one(label)
            times[label].append(time.perf_counter() - t0)

    print(f"{'label':14} {'us/step':>9} {'GB/s':>7}")
    for label, ts in times.items():
        fn, shape, steps = fns[label]
        nbytes = int(np.prod(shape)) * 4
        med = float(np.median(ts)) / steps
        print(f"{label:14} {med*1e6:>9.1f} {2*nbytes/med/1e9:>7.0f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
