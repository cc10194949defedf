"""In-kernel A/B: VPU pairwise collide vs MXU flat-contraction collide.

Decision benchmark for DESIGN.md's "MXU collision" lever (VERDICT round-1
item 2): both kernels iterate ONLY the collide+bounce-back stage on a
VMEM-resident state (no streaming/forcing), so the numbers isolate exactly
the stage the MXU formulation replaces.

  A (vpu):  state (9, ny, nx); kernel_common.collide per iteration.
  B (mxu):  state (9, L=ny*nx); (21,9) @ (9,L) dot_general with
            precision=HIGHEST (fp32 — bf16 rounding is fatal over 40k
            steps, see ops/mxu_collide.py), then the ~40-vop nonlinear tail.

Methodology per CLAUDE.md: one process, interleaved repeats, warm with the
exact timed executable, results materialized to host inside the timed
region.  Prints per-iteration and per-cell times and the verdict.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice, mxu_collide, reference
from advanced_hpc_lbm_tpu.params import LBMParams

NY = NX = 128
L = NY * NX
# large enough that in-kernel work dominates the ~50 ms per-call dispatch
# cost through the device tunnel (measured: 1000 iters was dispatch-bound)
N_ITERS = 20000

PARAMS = LBMParams(
    nx=NX, ny=NY, max_iters=N_ITERS, reynolds_dim=10,
    density=0.1, accel=0.005, omega=1.85,
)


def _vpu_kernel(f_ref, out_ref, *, n_steps):
    obst = jnp.zeros((NY, NX), jnp.float32) != 0.0

    def one(src, dst):
        planes = [src[k] for k in range(lattice.NSPEEDS)]
        out, _ = kernel_common.collide(planes, obst, PARAMS)
        for k in range(lattice.NSPEEDS):
            dst[k] = out[k]

    def body(s, carry):
        one(f_ref, out_ref)
        one(out_ref, f_ref)
        return carry

    jax.lax.fori_loop(0, n_steps // 2, body, 0)
    for k in range(lattice.NSPEEDS):
        out_ref[k] = f_ref[k]


def _mxu_kernel(mat_ref, w_ref, f_ref, out_ref, *, n_steps):
    # constants arrive as (24, 128) / (9, 128) padded operands (Pallas
    # kernels cannot capture array constants)
    mat_c = mat_ref[0:21, 0:9]
    wq = w_ref[:, 0:1]
    wm = w_ref[:, 1:2]

    def collide_flat_2d(s):
        proj = jax.lax.dot_general(
            mat_c, s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (21, L)
        rho = proj[0:1]
        m_x, m_y = proj[1:2], proj[2:3]
        lin = proj[3:12]
        cm = proj[12:21]
        inv_rho = 1.0 / rho
        msq = m_x * m_x + m_y * m_y
        return lin + (wq * (cm * cm) - wm * msq) * inv_rho

    def body(s, carry):
        out_ref[...] = collide_flat_2d(f_ref[...])
        f_ref[...] = collide_flat_2d(out_ref[...])
        return carry

    jax.lax.fori_loop(0, n_steps // 2, body, 0)
    out_ref[...] = f_ref[...]


@functools.lru_cache(maxsize=8)
def build(which: str, n_steps: int, interpret: bool = False):
    vm = pltpu.VMEM
    if which == "vpu":
        kern = functools.partial(_vpu_kernel, n_steps=n_steps)
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=vm)],
            out_specs=pl.BlockSpec(memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((9, NY, NX), jnp.float32),
            interpret=interpret,
        )
        return jax.jit(call)
    kern = functools.partial(_mxu_kernel, n_steps=n_steps)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=vm)] * 3,
        out_specs=pl.BlockSpec(memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((9, L), jnp.float32),
        interpret=interpret,
    )
    mat, w_quad, w_msq = mxu_collide._constants(PARAMS)
    mat_pad = np.zeros((24, 128), np.float32)
    mat_pad[:21, :9] = mat
    w_pad = np.zeros((9, 128), np.float32)
    w_pad[:, 0] = w_quad
    w_pad[:, 1] = w_msq
    mat_j, w_j = jnp.asarray(mat_pad), jnp.asarray(w_pad)
    return jax.jit(lambda x: call(mat_j, w_j, x))


def main():
    f0 = np.asarray(reference.initial_state(PARAMS))
    # perturb so the collide does real work (equilibrium is a fixed point)
    rng = np.random.RandomState(0)
    f0 = (f0 * (1.0 + 0.01 * rng.standard_normal(f0.shape))).astype(np.float32)
    fv = jnp.asarray(f0)
    fm = jnp.asarray(f0.reshape(9, L))

    # numeric cross-check first (10 iters, same trajectory up to fp assoc)
    va = np.asarray(build("vpu", 10)(fv))
    vb = np.asarray(build("mxu", 10)(fm)).reshape(9, NY, NX)
    err = np.max(np.abs(va - vb) / (np.abs(va) + 1e-12))
    print(f"cross-check max rel err over 10 iters: {err:.3e}")
    assert err < 1e-4, "formulations diverged"

    runs = {"vpu": (build("vpu", N_ITERS), fv), "mxu": (build("mxu", N_ITERS), fm)}
    # warm with the exact timed executables
    for name, (call, x) in runs.items():
        np.asarray(call(x))
    times: dict[str, list[float]] = {"vpu": [], "mxu": []}
    for _ in range(5):
        for name, (call, x) in runs.items():
            t0 = time.perf_counter()
            np.asarray(call(x))  # materialize to host inside timed region
            times[name].append(time.perf_counter() - t0)

    report = {}
    for name, ts in times.items():
        med = float(np.median(ts)) / N_ITERS
        report[name] = med
        print(
            f"{name}: {med*1e6:9.3f} us/iter  {med/L*1e12:8.2f} ps/cell  "
            f"(runs: {[f'{t:.4f}' for t in ts]})"
        )
    ratio = report["mxu"] / report["vpu"]
    print(f"mxu/vpu ratio: {ratio:.2f}x  ({'MXU WINS' if ratio < 1 else 'VPU wins'})")


if __name__ == "__main__":
    main()
