"""Probe 3: real step kernel vs pure copy, same process, interleaved,
sizes 1024/2048/4096, many repeats — best AND median per config, so the
shared-chip window noise can't fake a layout conclusion.
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

    from advanced_hpc_lbm_tpu.ops import fused, pallas_step, reference
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()

    def copy_kernel(f_ref, out_ref):
        for k in range(9):
            out_ref[k] = f_ref[k]

    @functools.lru_cache(maxsize=32)
    def build_copy(n, ty, steps):
        call = pl.pallas_call(
            copy_kernel,
            grid=(n // ty,),
            in_specs=[pl.BlockSpec((9, ty, n), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((9, ty, n), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((9, n, n), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=9 * n * n, bytes_accessed=int(72 * n * n),
                transcendentals=0,
            ),
        )

        def many(f):
            def body(c, _):
                return call(c), None

            out, _ = jax.lax.scan(body, f, None, length=steps)
            return out, jnp.sum(out[:, 0, :])

        return jax.jit(many, donate_argnums=0)

    @functools.lru_cache(maxsize=32)
    def build_step(n, steps):
        params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
        mask = np.zeros((n, n), dtype=bool)
        mask[0] = mask[-1] = True
        mask[:, 0] = mask[:, -1] = True
        obstacles = jnp.asarray(mask)
        runner = jax.jit(
            lambda f, o: fused.run_simulation(
                f, o, params, n_iters=steps,
                step_fn=pallas_step.pallas_fused_step,
            ),
            donate_argnums=0,
        )
        return runner, params, obstacles

    sizes = [(1024, 400), (2048, 100), (4096, 25)]
    fns = {}
    for n, steps in sizes:
        ty = pallas_step._pick_tile_rows(n, n)
        fns[("copy", n)] = (build_copy(n, ty, steps), steps, ty)
        fns[("step", n)] = (build_step(n, steps), steps, ty)

    def run_one(kind, n):
        fn, steps, _ = fns[(kind, n)]
        if kind == "copy":
            f = jnp.full((9, n, n), 0.1, jnp.float32)
            out, s = fn(f)
            return np.asarray(s)
        runner, params, obstacles = fn
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        return np.asarray(av)  # host materialization forces everything

    for key in fns:
        run_one(*key)
    times = {k: [] for k in fns}
    for _ in range(10):
        for key in fns:
            t0 = time.perf_counter()
            run_one(*key)
            times[key].append(time.perf_counter() - t0)

    print(f"{'kind':5} {'n':>5} {'ty':>3} {'best us/st':>10} {'med us/st':>10}"
          f" {'best GB/s':>9} {'best ns/cell':>12}")
    for (kind, n), ts in times.items():
        _, steps, ty = fns[(kind, n)]
        best = float(np.min(ts)) / steps
        med = float(np.median(ts)) / steps
        bpc = 73 if kind == "step" else 72
        print(f"{kind:5} {n:>5} {ty:>3} {best*1e6:>10.1f} {med*1e6:>10.1f}"
              f" {bpc*n*n/best/1e9:>9.0f} {best/(n*n)*1e9:>12.4f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
