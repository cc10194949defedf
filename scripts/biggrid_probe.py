"""Isolate why the step kernel falls off roofline at nx >= 2048.

Three kernels, same (9, ty, nx) row-slab tiling as ops.pallas_step, each
interleaved at 1024/2048/4096:

  copy     — out = in (pure HBM DMA: measures achievable stream bandwidth)
  collide  — out = collide(in) (adds the VPU work, no halo ops, no rolls)
  roll     — out = lane-rolled in (adds the x-rotate only)

If copy slows at 2048+, the DMA/layout is the problem; if copy tracks the
roofline but collide/roll fall off, it's a compute/relayout effect.
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

    from advanced_hpc_lbm_tpu.ops import kernel_common, lattice, pallas_step
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    def copy_kernel(f_ref, out_ref):
        for k in range(9):
            out_ref[k] = f_ref[k]

    def roll_kernel(f_ref, out_ref, *, nx):
        for k in range(9):
            out_ref[k] = pltpu.roll(f_ref[k], 1 if k % 2 else nx - 1, axis=1)

    def collide_kernel(f_ref, out_ref, *, params):
        obst = f_ref[0] < 0.0  # all-false, fp32-born
        planes = [f_ref[k] for k in range(9)]
        out, _ = kernel_common.collide(planes, obst, params)
        for k in range(9):
            out_ref[k] = out[k]

    @functools.lru_cache(maxsize=32)
    def build(which, ny, nx, ty, steps):
        params = LBMParams(nx, ny, 1, 10, 0.1, 0.01, 1.85)
        if which == "copy":
            kern = copy_kernel
        elif which == "roll":
            kern = functools.partial(roll_kernel, nx=nx)
        else:
            kern = functools.partial(collide_kernel, params=params)
        call = pl.pallas_call(
            kern,
            grid=(ny // ty,),
            in_specs=[
                pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        )

        def many(f):
            def body(c, _):
                return call(c), None

            out, _ = jax.lax.scan(body, f, None, length=steps)
            # scalarize on device: the host transfer in run_one must force
            # the whole computation (block_until_ready through the tunnel
            # under-reports — CLAUDE.md)
            return jnp.sum(out[:, 0, :])

        return jax.jit(many, donate_argnums=0)

    sizes = [(1024, 200), (2048, 60), (4096, 20)]
    kinds = ["copy", "roll", "collide"]
    fns = {}
    for n, steps in sizes:
        ty = pallas_step._pick_tile_rows(n, n)
        for kind in kinds:
            fns[(kind, n)] = (build(kind, n, n, ty, steps), steps, ty)

    def run_one(kind, n):
        fn, steps, _ = fns[(kind, n)]
        f = jnp.full((9, n, n), 0.1, jnp.float32)
        return np.asarray(fn(f))  # host materialization inside timed region

    for (kind, n) in fns:  # warm exact executables
        run_one(kind, n)

    times = {k: [] for k in fns}
    for _ in range(5):
        for key in fns:
            t0 = time.perf_counter()
            run_one(*key)
            times[key].append(time.perf_counter() - t0)

    print(f"{'kind':8} {'n':>5} {'ty':>3} {'us/step':>9} {'ns/cell':>8} {'GB/s':>7}")
    for (kind, n), ts in times.items():
        _, steps, ty = fns[(kind, n)]
        med = float(np.median(ts)) / steps
        nscell = med / (n * n) * 1e9
        gbs = 72 * n * n / med / 1e9  # 9 planes in + out, fp32
        print(f"{kind:8} {n:>5} {ty:>3} {med*1e6:>9.1f} {nscell:>8.4f} {gbs:>7.0f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
