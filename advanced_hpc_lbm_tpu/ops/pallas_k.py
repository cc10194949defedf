"""K-steps-per-pass ghost-zone Pallas kernel — the big-grid traffic cutter.

Generalizes ops.pallas_multi (K=2) to any K <= 8: each row-slab tile
advances K timesteps per HBM round-trip by starting from a +-K-deep
overlapped window (rows [a-K, b+K)) that shrinks by one row per side per
step — the classic trapezoidal/ghost-zone time tiling.  Seam rows are
recomputed redundantly by the adjacent tile (2K/ty extra compute per
step-K pass).

Why this exists (round-2 measurement, scripts/biggrid_probe*.py): at
nx >= 2048 the 1-step kernel is *pure-DMA-bound* — it exactly matches a
9-plane copy kernel at every size, and the device's achievable copy
bandwidth itself drops ~1.65x at large footprints (~250 GB/s at 600 MB
arrays vs ~430 GB/s at 37 MB, window-scaled).  No layout change recovers
it (flat/tall/x-split all identical), so the only lever left is moving
fewer bytes per step: K steps per pass cost ~(73 + halo)/K B/cell/step.
At 1024^2 the 1-step kernel already sits at the traffic floor with VPU
slack ~0, so K > 1 loses there (measured for K=2, BENCH.md); at 4096^2
the DMA slack is ~3.5x and K wins.

Machinery matches pallas_multi one level deeper: K parked pre-step rows
(+mask rows) in persistent scratch for the top halo, the pipelined 8-row
block at global row (i+1)*ty for the bottom (K <= 8 rows used), the
constant-index wrap block for tile 0, forcing re-applied inside every
step's window via mod-ny row ids (covers the wrap occurrences of row
ny-2), per-step ||u|| reductions over the tile's own rows to SMEM (G, K).
Reference parity: d2q9-bgk.c:228-1813 (the fused step), run K at a time.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice, pallas_step
from advanced_hpc_lbm_tpu.ops.pallas_multi import _stream_window
from advanced_hpc_lbm_tpu.params import LBMParams

_LANE = 128


# VMEM budget for kernel buffers.  The chip has >= ~100 MB of usable VMEM
# (XLA promotes 75 MB of scan carries into it at 1024^2); Mosaic's DEFAULT
# scoped limit is ~10 MB, raised per-call via
# CompilerParams(vmem_limit_bytes) — verified to compile and run at 100 MB
# on this remote compile helper.  80 MB of buffers leaves headroom
# for spill/temporaries inside the K-step bodies.
_VMEM_BUDGET = 80 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _vmem_limit() -> int:
    """Scoped-VMEM limit for the kernel (bytes).  LBM_PALLASK_VMEM_MB
    overrides for probing tiles beyond the default budget (the chip has
    128 MiB; the resident kernel runs at a 127 MiB limit)."""
    override = os.environ.get("LBM_PALLASK_VMEM_MB")
    if override:
        return int(override) * 1024 * 1024
    return _VMEM_LIMIT


def _pick_tile_rows(ny: int, nx: int, k: int) -> int | None:
    """Largest 8-multiple row-slab dividing ny whose buffers (4 x 36*ty*nx
    main blocks + halos/scratch) fit _VMEM_BUDGET.  Large ty is what makes
    big K cheap: the ghost-zone seam recompute is 2K/ty.

    The budget charges the two lean ping-pong window buffers
    unconditionally: lean=True is the shipped default everywhere
    (multi_step/run), and gating on the lean footprint keeps the naive
    fallback body (a debugging aid) on strictly safer tiles."""
    override = os.environ.get("LBM_PALLASK_TY")
    if override:
        ty = int(override)
        return ty if ny % ty == 0 and ty % 8 == 0 else None
    fixed = (
        2 * 9 * 8 * nx * 4  # bottom halo, double-buffered
        + 2 * 8 * nx * 4  # bottom mask halo
        + (9 + 1) * 8 * nx * 4  # wrap scratch (DMA'd once)
        + (9 + 1) * k * nx * 4  # parked rows
        + 72 * 2 * k * nx  # lean ping-pong windows, ghost-row part
    )
    # 146 B/row: in+out f double-buffered + masks; +72 B/row: the lean
    # step's two (9, ty+2K, nx) ping-pong window buffers
    budget_rows = max(8, ((_VMEM_BUDGET - fixed) // (218 * nx)) // 8 * 8)
    for ty in (128, 64, 32, 16, 8):
        if ny % ty == 0 and max(k, 8) <= ty <= budget_rows:
            return ty
    return None


def _vmem_estimate(ny: int, nx: int, k: int) -> int | None:
    """Total kernel VMEM (operand buffers + scratch), bytes."""
    ty = _pick_tile_rows(ny, nx, k)
    if ty is None:
        return None
    return (
        4 * 36 * ty * nx  # in+out, double-buffered
        + 2 * 9 * 8 * nx * 4  # bottom halo
        + 2 * (ty + 8) * nx * 4  # f32 masks (main + bottom halo)
        + (9 + 1) * 8 * nx * 4  # wrap DMA landing
        + (9 + 1) * k * nx * 4  # parked rows
        + 72 * (ty + 2 * k) * nx  # lean ping-pong windows
    )


def best_k(ny: int, nx: int) -> int | None:
    """Best K (measured, lean body, long interleaved calls): the lean step
    made the kernel compute-leaning, so moderate K with less seam
    recompute wins — 8192^2/ty=32 K=6 16.06 > K=4 15.91 > K=8 15.51
    GLUPS (seam 2K/ty: 37.5% vs 50%); 4096^2/ty=64 K=6 == K=8 (18.15 vs
    18.14); 2048^2/ty=128 K=4 == K=3 (20.6 vs 20.7, noise) and > K=8.
    Seam guard: 4K <= ty keeps redundant compute <= 50%."""
    order = (6, 8, 4, 3, 2) if ny * nx > 2048 * 2048 else (4, 6, 8, 3, 2)
    for k in order:
        if not supported(ny, nx, k):
            continue
        ty = _pick_tile_rows(ny, nx, k)
        if 4 * k <= ty:
            return k
    return None


def supported(ny: int, nx: int, k: int) -> bool:
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return (
        on_tpu
        and 2 <= k <= 8
        and nx % _LANE == 0
        and ny % 8 == 0
        and ny >= 4 * k
        and _pick_tile_rows(ny, nx, k) is not None
    )


def _kernel_k(
    f_ref, bot_ref, f_any, om_ref, ob_ref, om_any,
    out_ref, tot_ref, park_f, park_o, wrap_scr, wrapo_scr, sem_f, sem_o,
    *, params: LBMParams, k: int, ty: int, ny: int, nx: int,
):
    i = pl.program_id(0)
    zero = jnp.float32(0.0)

    # tile 0's K top-halo rows are the wrap rows [ny-K, ny): fetched once
    # per call by explicit DMA of the last 8-row granule from the
    # HBM-resident operands (cheaper in VMEM than a pipelined block —
    # see _pick_tile_rows)
    @pl.when(i == 0)
    def _load_wrap_rows():
        dma_f = pltpu.make_async_copy(
            f_any.at[:, ny - 8 : ny, :], wrap_scr, sem_f
        )
        dma_o = pltpu.make_async_copy(
            om_any.at[ny - 8 : ny, :], wrapo_scr, sem_o
        )
        dma_f.start()
        dma_o.start()
        dma_f.wait()
        dma_o.wait()
        for kk in range(lattice.NSPEEDS):
            park_f[kk] = wrap_scr[kk, 8 - k : 8, :]
        park_o[...] = wrapo_scr[8 - k : 8, :]

    # read this tile's top halo before re-parking for the next tile
    top_f = [park_f[kk][...] for kk in range(lattice.NSPEEDS)]
    top_o = park_o[...]
    for kk in range(lattice.NSPEEDS):
        park_f[kk] = f_ref[kk, ty - k : ty, :]
    park_o[...] = om_ref[ty - k : ty, :]

    # step-0 window: global rows [a-K, b+K)
    w = [
        jnp.concatenate([top_f[kk], f_ref[kk], bot_ref[kk, 0:k, :]], axis=0)
        for kk in range(lattice.NSPEEDS)
    ]
    w_of = jnp.concatenate([top_o, om_ref[...], ob_ref[0:k, :]], axis=0)
    w_obst = w_of != 0.0
    obst_main = om_ref[...] != 0.0

    for s in range(k):
        depth = k - s  # halo depth entering this step
        rows = ty + 2 * depth
        rowids = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0)
            + i * ty - depth
        ) % ny
        w = kernel_common.forced(w, w_obst, rowids == ny - 2, params)
        streamed = _stream_window(w, rows - 2)
        w_obst = jax.lax.slice_in_dim(w_obst, 1, rows - 1, axis=0)
        w, u_sq = kernel_common.collide(streamed, w_obst, params)
        # reduction over the tile's own rows [a, b): offset depth-1
        norm = jnp.sqrt(
            jax.lax.slice_in_dim(u_sq, depth - 1, depth - 1 + ty, axis=0)
        )
        tot_ref[i, s] = jnp.sum(jnp.where(obst_main, zero, norm))

    for kk in range(lattice.NSPEEDS):
        out_ref[kk] = w[kk]


def _kernel_k_lean(
    f_ref, bot_ref, f_any, om_ref, ob_ref, om_any,
    out_ref, tot_ref, park_f, park_o, wrap_scr, wrapo_scr, wa, wb,
    sem_f, sem_o,
    *, params: LBMParams, k: int, ty: int, ny: int, nx: int,
):
    """Liveness-lean variant of _kernel_k: the K-step trapezoid ping-pongs
    between two scratch window buffers, with each step structured like
    ops.resident's lean step (force+stream plane-at-a-time into the dst
    ref, moments from accumulator reloads, collision pairs stored as
    computed).  The naive value-list step keeps ~18 whole windows live and
    Mosaic spills them; in the K-step regime the kernel is VPU/VMEM-bound
    (DMA is already cut K-fold), so the spill round-trips are on the
    critical path.

    Every step runs over the FULL (ty+2K, nx) window: the pull-rolls wrap
    at the window edge, writing garbage into exactly the rows the
    trapezoid invalidates anyway (valid region [s, T-s) after step s, so
    rows [K, K+ty) are correct after K steps).  Full-window ops keep all
    ref loads/stores whole-plane and sublane-aligned — Mosaic crashes on
    sublane-offset row-sliced stores (ApplyVectorLayoutPass assert,
    measured) — at the cost of ~K/(ty+K) extra row compute vs the
    shrinking-window form.  Same fp op order as kernel_common.collide."""
    i = pl.program_id(0)
    zero = jnp.float32(0.0)
    T = ty + 2 * k

    @pl.when(i == 0)
    def _load_wrap_rows():
        dma_f = pltpu.make_async_copy(
            f_any.at[:, ny - 8 : ny, :], wrap_scr, sem_f
        )
        dma_o = pltpu.make_async_copy(
            om_any.at[ny - 8 : ny, :], wrapo_scr, sem_o
        )
        dma_f.start()
        dma_o.start()
        dma_f.wait()
        dma_o.wait()
        for kk in range(lattice.NSPEEDS):
            park_f[kk] = wrap_scr[kk, 8 - k : 8, :]
        park_o[...] = wrapo_scr[8 - k : 8, :]

    # read this tile's top halo, materialize the step-0 window, re-park
    top_o = park_o[...]
    for kk in range(lattice.NSPEEDS):
        wa[kk] = jnp.concatenate(
            [park_f[kk][...], f_ref[kk], bot_ref[kk, 0:k, :]], axis=0
        )
        park_f[kk] = f_ref[kk, ty - k : ty, :]
    park_o[...] = om_ref[ty - k : ty, :]

    w_of = jnp.concatenate([top_o, om_ref[...], ob_ref[0:k, :]], axis=0)
    w_obst = w_of != 0.0
    obst_main = om_ref[...] != 0.0
    # global row ids of window rows (row j <-> global i*ty - k + j)
    accel_T = (
        (jax.lax.broadcasted_iota(jnp.int32, (T, nx), 0) + i * ty - k) % ny
    ) == (ny - 2)

    src, dst = wa, wb
    for s in range(k):
        # the shared liveness-lean step (kernel_common.lean_window_step):
        # force + pull-stream plane-at-a-time into dst (the y-roll wraps
        # at the window edge = trapezoid garbage rows), then moments +
        # pairwise BGK + bounce-back in place on dst
        u_sq = kernel_common.lean_window_step(
            src, dst, w_obst, accel_T, params, T, nx
        )
        norm = jnp.sqrt(jax.lax.slice_in_dim(u_sq, k, k + ty, axis=0))
        tot_ref[i, s] = jnp.sum(jnp.where(obst_main, zero, norm))
        src, dst = dst, src

    # after K steps (and the final swap) the state sits in `src`,
    # rows [k, k+ty) = the tile's own rows
    for kk in range(lattice.NSPEEDS):
        out_ref[kk] = src[kk, k : k + ty, :]


@functools.lru_cache(maxsize=16)
def _build_call(
    params: LBMParams, ny: int, nx: int, ty: int, k: int, interpret: bool,
    lean: bool = False,
):
    grid = (ny // ty,)
    kernel = functools.partial(
        _kernel_k_lean if lean else _kernel_k,
        params=params, k=k, ty=ty, ny=ny, nx=nx,
    )
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec(
                (9, 8, nx),
                lambda i: (0, (((i + 1) * ty) % ny) // 8, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # full f, wrap-row DMA src
            pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec(
                (8, nx),
                lambda i: ((((i + 1) * ty) % ny) // 8, 0),
                memory_space=vm,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # full mask, wrap DMA src
        ],
        out_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, k, nx), jnp.float32),  # parked top rows
            pltpu.VMEM((k, nx), jnp.float32),  # parked top mask rows
            pltpu.VMEM((9, 8, nx), jnp.float32),  # wrap-row DMA landing
            pltpu.VMEM((8, nx), jnp.float32),
        ]
        + (
            # lean: two ping-pong window buffers (9, ty+2K, nx)
            [
                pltpu.VMEM((9, ty + 2 * k, nx), jnp.float32),
                pltpu.VMEM((9, ty + 2 * k, nx), jnp.float32),
            ]
            if lean
            else []
        )
        + [
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(130 * k * ny * nx),
            bytes_accessed=int(82 * ny * nx),
            transcendentals=int(k * ny * nx),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )


def prepare_obstacles(obstacles: jax.Array) -> jax.Array:
    # fp32 mask: the 8-row halo mask blocks are below the int8 min tile
    return obstacles.astype(jnp.float32)


def multi_step(
    f: jax.Array,
    obstacles_f32: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    k: int,
    *,
    interpret: bool = False,
    lean: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Advance K timesteps in one HBM pass; returns (f_next, av_k (K,)).

    lean=True (default) uses the liveness-lean step — measured 1.3-1.4x
    over the naive value-list step at 2048^2/4096^2 with bitwise-identical
    av histories (scripts/pallask_lean_probe.py)."""
    _, ny, nx = f.shape
    ty = _pick_tile_rows(ny, nx, k)
    if ty is None or nx % _LANE:
        raise ValueError(f"grid {ny}x{nx} not tileable for the K-step kernel")
    if obstacles_f32.dtype != jnp.float32:
        obstacles_f32 = prepare_obstacles(obstacles_f32)
    call = _build_call(params, ny, nx, ty, k, interpret, lean)
    f_next, tots = call(
        f, f, f, obstacles_f32, obstacles_f32, obstacles_f32
    )
    return f_next, jnp.sum(tots, axis=0) / n_fluid


def run(
    f0: jax.Array,
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int | None = None,
    k: int = 4,
    interpret: bool = False,
    lean: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Full loop at K steps per pass (tail via the 1-step kernel).
    Drop-in for ops.fused.run_simulation; wrap in jax.jit."""
    iters = params.max_iters if n_iters is None else n_iters
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)
    obst_f = prepare_obstacles(obstacles)

    def one(f):
        return multi_step(
            f, obst_f, n_fluid, params, k, interpret=interpret, lean=lean
        )

    # two kernel calls per scan iteration so the loop carry needs no
    # in-place custom-call update — with one call per iteration XLA
    # inserts a full-state copy into the body (see ops.fused.run_simulation)
    def body(f, _):
        f1, av1 = one(f)
        f2, av2 = one(f1)
        return f2, jnp.concatenate([av1, av2])

    f, av_chunks = jax.lax.scan(body, f0, None, length=iters // (2 * k))
    av = av_chunks.reshape(-1)
    done = (iters // (2 * k)) * 2 * k
    if iters - done >= k:
        f, av_mid = one(f)
        av = jnp.concatenate([av, av_mid])
        done += k
    if iters - done:
        obst8 = pallas_step.prepare_obstacles(obstacles)
        for _ in range(iters - done):
            f, av_last = pallas_step.pallas_fused_step(
                f, obst8, n_fluid, params, interpret=interpret
            )
            av = jnp.concatenate([av, av_last[None]])
    return f, av
