"""Definitive size curve: auto-selected backend per size, long amortized
calls, one process, interleaved repeats (see BENCH.md for the capture)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from advanced_hpc_lbm_tpu.ops import pallas_k, reference, resident
from advanced_hpc_lbm_tpu.params import LBMParams
from advanced_hpc_lbm_tpu.utils import cache

cache.enable()
plan = [  # (n, iters)
    (128, 40000), (256, 20000), (512, 8000), (1024, 20000),
    (2048, 4000), (4096, 1200), (8192, 400),
]
setups = {}
for n, iters in plan:
    params = LBMParams(nx=n, ny=n, max_iters=iters, reynolds_dim=10,
                       density=0.1, accel=0.01, omega=1.85)
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True; mask[:, 0] = mask[:, -1] = True
    obst = jnp.asarray(mask)
    if resident.supported(n, n):
        backend = "resident"
        fn = jax.jit(lambda f, o, _p=params, _i=iters: resident.resident_run(f, o, _p, n_iters=_i))
    else:
        k = pallas_k.best_k(n, n)
        backend = f"pallask K={k} ty={pallas_k._pick_tile_rows(n, n, k)}"
        fn = jax.jit(lambda f, o, _p=params, _i=iters, _k=k: pallas_k.run(f, o, _p, n_iters=_i, k=_k))
    f, av = fn(reference.initial_state(params), obst); np.asarray(av); f.block_until_ready()
    setups[n] = (params, obst, fn, iters, backend)
    print(f"# warmed {n} ({backend})", flush=True)

times = {n: [] for n in setups}
for _ in range(3):
    for n, (params, obst, fn, iters, backend) in setups.items():
        t0 = time.perf_counter()
        f, av = fn(reference.initial_state(params), obst)
        np.asarray(av); f.block_until_ready()
        times[n].append(time.perf_counter() - t0)
print(f"{'grid':>6} {'backend':>18} {'us/step':>9} {'GLUPS':>7} {'ns/cell':>8}")
for n, (params, obst, fn, iters, backend) in setups.items():
    best = min(times[n])
    us = best / iters * 1e6
    gl = n * n * iters / best / 1e9
    print(f"{n:>5}² {backend:>18} {us:>9.2f} {gl:>7.2f} {us * 1e3 / (n * n):>8.4f}", flush=True)
