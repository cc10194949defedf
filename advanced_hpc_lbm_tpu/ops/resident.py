"""VMEM-resident whole-run kernel for small and medium grids.

For decks whose two distribution buffers fit in VMEM (up to ~37.75 MB
per buffer: every reference validation deck AND the 1024x1024 headline
deck), the entire main loop runs *inside* one Pallas kernel: the state
ping-pongs between the input and output VMEM blocks across a
``fori_loop`` of fused double-steps, with **zero HBM traffic per step**.
The only HBM motion is one state read + one write per ~CHUNK steps plus
the per-step av-velocity scalars (SMEM).

This attacks the regime where the per-step HBM-roundtrip kernel is
dispatch/latency-bound: the reference's 128x128 deck is 40 000 steps of
just 16k cells (d2q9-bgk.c:180-201 with input_128x128.params), which is
~2 us of VPU work per step once resident.

The run is chunked (default 1000 steps per pallas_call) so the per-step
av history lands in a small SMEM output and XLA's scan stacks the chunks;
physics per step is identical to ops.pallas_step (same streaming, forcing,
bounce-back, pairwise BGK, pre-collision-moment reduction) with periodic
streaming expressed as whole-plane sublane/lane rotates (pltpu.roll).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice
from advanced_hpc_lbm_tpu.params import LBMParams

MASK_DTYPE = jnp.int8
_LANE = 128

# one resident buffer (9 planes fp32) must stay under this.  The binding
# budget is the v5e's 128 MiB of VMEM: two resident buffers (2 x 37.75 MB
# at 1024^2) + the obstacle plane + the kernel's live temporaries must fit
# under the scoped-VMEM limit.  The liveness-lean step (see _one_step)
# keeps peak temporaries to a handful of planes, which is what lets
# 1024x1024 fit — measured 16.5-17.2 GLUPS there vs 13.4-13.85 for the
# per-step tiled kernel (BENCH.md).
_MAX_BUFFER_BYTES = 37_800_000
_VMEM_LIMIT_BYTES = 127 * 1024 * 1024


def supported(ny: int, nx: int) -> bool:
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return (
        on_tpu
        and nx % _LANE == 0
        and ny % 8 == 0
        and 9 * ny * nx * 4 <= _MAX_BUFFER_BYTES
    )


def _one_step(
    src, dst, obst, accel_rows, t, avs_ref, *, params: LBMParams, ny, nx
):
    """One fused timestep reading planes from ref ``src`` and writing ref
    ``dst``; appends the step's tot_u to avs_ref[t, 0].

    Same physics as kernel_common.forced + collide (oracle-tested in
    interpret mode), restructured for minimal whole-plane liveness: the
    naive three-list form (forced, streamed, out) keeps ~18 planes live
    at once, which Mosaic's register allocator turns into ~2 buffers'
    worth of VMEM spill slots — at 1024x1024 that alone is 70 MB and the
    kernel exceeds the 128 MiB chip VMEM.  The step body is the shared
    :func:`kernel_common.lean_window_step` with T=ny (a VMEM-resident
    grid is its own window and the roll wrap is REAL periodicity, not
    trapezoid garbage); forcing arrives as the row-ny-2 mask because
    row-sliced writes at an unaligned sublane offset are fragile in
    Mosaic (d2q9-bgk.c:239-260 semantics)."""
    u_sq = kernel_common.lean_window_step(
        src, dst, obst, accel_rows, params, ny, nx
    )
    avs_ref[t, 0] = jnp.sum(
        jnp.where(obst, jnp.float32(0.0), jnp.sqrt(u_sq))
    )


def _chunk_kernel(
    f_ref, obst_ref, out_ref, avs_ref, *, params: LBMParams, ny, nx, n_steps
):
    obst = obst_ref[...].astype(jnp.float32) != 0.0
    accel_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0) == ny - 2
    )
    step = functools.partial(_one_step, params=params, ny=ny, nx=nx)

    def double_step(s, carry):
        step(f_ref, out_ref, obst, accel_rows, 2 * s, avs_ref)
        step(out_ref, f_ref, obst, accel_rows, 2 * s + 1, avs_ref)
        return carry

    jax.lax.fori_loop(0, n_steps // 2, double_step, 0)
    if n_steps % 2:
        step(f_ref, out_ref, obst, accel_rows, n_steps - 1, avs_ref)
        # state ends in out_ref; nothing further needed
    else:
        # even count: state ended back in f_ref; publish it
        for k in range(lattice.NSPEEDS):
            out_ref[k] = f_ref[k]


@functools.lru_cache(maxsize=32)
def _build_chunk_call(
    params: LBMParams, ny: int, nx: int, n_steps: int, interpret: bool
):
    kernel = functools.partial(
        _chunk_kernel, params=params, ny=ny, nx=nx, n_steps=n_steps
    )
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((9, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, nx), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, ny, nx), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(120 * ny * nx) * n_steps,
            bytes_accessed=int(73 * ny * nx),
            transcendentals=int(ny * nx) * n_steps,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )


def prepare_obstacles(obstacles: jax.Array) -> jax.Array:
    return obstacles.astype(MASK_DTYPE)


def resident_run(
    f0: jax.Array,
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int | None = None,
    chunk: int = 1000,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Run the whole main loop in VMEM-resident chunks.

    Drop-in for ops.fused.run_simulation: returns (f_final, av_vels).
    Call under jax.jit (see models.d2q9_bgk.Simulation.run).
    """
    _, ny, nx = f0.shape
    iters = params.max_iters if n_iters is None else n_iters
    if 9 * ny * nx * 4 > _MAX_BUFFER_BYTES or nx % _LANE or ny % 8:
        raise ValueError(
            f"grid {ny}x{nx} too large or untileable for the resident "
            "kernel; use the 'pallas' backend"
        )
    # the per-step av scalars live in SMEM, where each (1,1) row costs
    # 512 B of the ~1 MB budget — beyond ~1.5k steps/chunk the kernel
    # fails to allocate, so clamp (measured: throughput is insensitive
    # to chunk size from 250 to 1000)
    chunk = min(chunk, 1500)
    obst8 = prepare_obstacles(obstacles)
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)

    n_chunks, tail = divmod(iters, chunk)
    avs_parts = []
    f = f0
    if n_chunks:
        call = _build_chunk_call(params, ny, nx, chunk, interpret)

        def body(carry_f, _):
            f_next, tots = call(carry_f, obst8)
            return f_next, tots[:, 0]

        f, av_main = jax.lax.scan(body, f, None, length=n_chunks)
        avs_parts.append(av_main.reshape(-1))
    if tail:
        call = _build_chunk_call(params, ny, nx, tail, interpret)
        f, tots = call(f, obst8)
        avs_parts.append(tots[:, 0])

    av_vels = (
        jnp.concatenate(avs_parts) if avs_parts else jnp.zeros((0,), jnp.float32)
    )
    return f, av_vels / n_fluid
