"""Two-steps-per-pass Pallas kernel — halves HBM traffic for big grids.

The single-step kernel (ops.pallas_step) is HBM-bound at ~73 B/cell/step.
This kernel advances each row-slab TWO timesteps per HBM round-trip:

* step 1 is computed on an overlapped window — output rows [a-1, b+1)
  from input rows [a-2, b+2) — so that step 2 of the tile's own rows
  [a, b) needs no neighbor results (the classic overlapped/ghost-zone
  multi-step stencil tiling; the seam rows are recomputed redundantly by
  the adjacent tile, ~2/ty extra compute);
* the +-2-deep top halo comes from two rows parked in persistent VMEM
  scratch by the previous tile (pre-step values), the bottom halo from the
  pipelined 8-row block at global row (i+1)*ty, and tile 0's top wrap from
  a constant-index 8-row operand — same machinery as ops.pallas_step, one
  row deeper;
* the acceleration forcing (d2q9-bgk.c:239-260) is applied as a masked
  row-id update *inside each step's window*, which uniformly covers both
  occurrences of global row ny-2: interior of the last tile, and window
  row 0 of tile 0 (the wrap);
* both steps' ||u|| reductions are emitted per tile (SMEM (G, 2)).

Net traffic: ~((ty+8)/ty * 36 + 40) / 2 = ~41 B/cell/step at ty=32 —
a ~52 us/step floor at 1024^2 on v5e vs ~105 us for the 1-step kernel.
Obstacle masks ride as fp32 here (halo mask blocks of 8 rows are below
the int8 min sublane tile).

MEASURED OUTCOME (v5e, interleaved runs): the step is VPU-compute-bound,
so halving traffic does not pay — this kernel ties or slightly trails the
1-step kernel (extra seam compute + unaligned window shapes).  It is kept
as an explicit backend (`pallas2`) because the trade flips on parts with
higher HBM:VPU ratios and for future compute-side optimization; `auto`
prefers the 1-step kernel (DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice, pallas_step
from advanced_hpc_lbm_tpu.params import LBMParams

_LANE = 128


def _pick_tile_rows(ny: int, nx: int) -> int | None:
    import os

    override = os.environ.get("LBM_PALLAS2_TY")
    if override:
        ty = int(override)
        return ty if ny % ty == 0 and ty % 8 == 0 else None
    budget_rows = max(8, (2_000_000 // (36 * nx)) // 8 * 8)
    for ty in (32, 64, 16, 8):
        if ny % ty == 0 and ty <= budget_rows:
            return ty
    return None


def supported(ny: int, nx: int) -> bool:
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return (
        on_tpu
        and nx % _LANE == 0
        and ny % 8 == 0
        and ny >= 16
        and _pick_tile_rows(ny, nx) is not None
    )


def _stream_window(planes, rows_out: int):
    """Pull-stream ``planes`` (list of (rows_out + 2, nx)) down to
    (rows_out, nx): slice off the y-halo per speed, lane-roll for x."""
    out = []
    for k in range(lattice.NSPEEDS):
        cy, cx = int(lattice.CY[k]), int(lattice.CX[k])
        rows = jax.lax.slice_in_dim(planes[k], 1 - cy, 1 - cy + rows_out, axis=0)
        if cx:
            nx = rows.shape[1]
            rows = pltpu.roll(rows, cx % nx, axis=1)
        out.append(rows)
    return out


# collision and forcing are the shared routines in ops.kernel_common
_collide = kernel_common.collide
_forced = kernel_common.forced


def _kernel2(
    f_ref, bot_ref, wrap_ref, om_ref, ob_ref, ow_ref,
    out_ref, tot_ref, park_f, park_o,
    *, params: LBMParams, ty: int, ny: int, nx: int,
):
    i = pl.program_id(0)
    zero = jnp.float32(0.0)

    # tile 0's two top-halo rows are the wrap rows ny-2, ny-1 (rows 6,7 of
    # the constant-index wrap block)
    @pl.when(i == 0)
    def _load_wrap_rows():
        for k in range(lattice.NSPEEDS):
            park_f[k] = wrap_ref[k, 6:8, :]
        park_o[...] = ow_ref[6:8, :]

    # read this tile's top halo (parked by the previous tile) BEFORE
    # re-parking for the next tile
    top_f = [park_f[k][...] for k in range(lattice.NSPEEDS)]
    top_o = park_o[...]

    # park the last two pre-step rows for the next tile
    for k in range(lattice.NSPEEDS):
        park_f[k] = f_ref[k, ty - 2 : ty, :]
    park_o[...] = om_ref[ty - 2 : ty, :]

    # step-0 window: global rows [a-2, b+2), masks as f32 then one compare
    w0 = [
        jnp.concatenate([top_f[k], f_ref[k], bot_ref[k, 0:2, :]], axis=0)
        for k in range(lattice.NSPEEDS)
    ]
    w0_of = jnp.concatenate([top_o, om_ref[...], ob_ref[0:2, :]], axis=0)
    w0_obst = w0_of != 0.0
    obst_main = om_ref[...] != 0.0

    # global row ids of the window rows (mod ny): a-2 + r
    rowids0 = (
        jax.lax.broadcasted_iota(jnp.int32, (ty + 4, nx), 0) + i * ty - 2
    ) % ny
    w0 = _forced(w0, w0_obst, rowids0 == ny - 2, params)

    # ---- step 1: output rows [a-1, b+1) ----
    s1 = _stream_window(w0, ty + 2)
    o1 = jax.lax.slice_in_dim(w0_obst, 1, ty + 3, axis=0)
    f1, u_sq1 = _collide(s1, o1, params)
    # av for step 1 over the tile's own rows [a, b)
    norm1 = jnp.sqrt(jax.lax.slice_in_dim(u_sq1, 1, ty + 1, axis=0))
    tot_ref[i, 0] = jnp.sum(jnp.where(obst_main, zero, norm1))

    # forcing for step 2 acts on the step-1 state (window rows [a-1, b+1))
    rowids1 = (
        jax.lax.broadcasted_iota(jnp.int32, (ty + 2, nx), 0) + i * ty - 1
    ) % ny
    f1 = _forced(f1, o1, rowids1 == ny - 2, params)

    # ---- step 2: output rows [a, b) ----
    s2 = _stream_window(f1, ty)
    f2, u_sq2 = _collide(s2, obst_main, params)
    tot_ref[i, 1] = jnp.sum(jnp.where(obst_main, zero, jnp.sqrt(u_sq2)))

    for k in range(lattice.NSPEEDS):
        out_ref[k] = f2[k]


@functools.lru_cache(maxsize=16)
def _build_call(params: LBMParams, ny: int, nx: int, ty: int, interpret: bool):
    grid = (ny // ty,)
    kernel = functools.partial(_kernel2, params=params, ty=ty, ny=ny, nx=nx)
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
            pl.BlockSpec(
                (9, 8, nx), lambda i: (0, (ny - 8) // 8, 0), memory_space=vm
            ),
            pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec(
                (8, nx),
                lambda i: ((((i + 1) * ty) % ny) // 8, 0),
                memory_space=vm,
            ),
            pl.BlockSpec((8, nx), lambda i: ((ny - 8) // 8, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, 2, nx), jnp.float32),  # parked top rows
            pltpu.VMEM((2, nx), jnp.float32),  # parked top mask rows
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(260 * ny * nx),
            bytes_accessed=int(82 * ny * nx),
            transcendentals=int(2 * ny * nx),
        ),
        interpret=interpret,
    )


def prepare_obstacles(obstacles: jax.Array) -> jax.Array:
    return obstacles.astype(jnp.float32)


def double_step(
    f: jax.Array,
    obstacles_f32: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Advance two timesteps; returns (f_next2, av_step1, av_step2)."""
    _, ny, nx = f.shape
    ty = _pick_tile_rows(ny, nx)
    if ty is None or nx % _LANE:
        raise ValueError(f"grid {ny}x{nx} not tileable for the 2-step kernel")
    if obstacles_f32.dtype != jnp.float32:
        obstacles_f32 = prepare_obstacles(obstacles_f32)
    call = _build_call(params, ny, nx, ty, interpret)
    f2, tots = call(f, f, f, obstacles_f32, obstacles_f32, obstacles_f32)
    return f2, jnp.sum(tots[:, 0]) / n_fluid, jnp.sum(tots[:, 1]) / n_fluid


def run(
    f0: jax.Array,
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Full loop using the 2-step kernel (odd tail via the 1-step kernel).
    Drop-in for ops.fused.run_simulation; wrap in jax.jit."""
    iters = params.max_iters if n_iters is None else n_iters
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)
    obst_f = prepare_obstacles(obstacles)

    # two kernel calls per scan iteration (copy-free carry — see
    # ops.fused.run_simulation's paired body)
    def body(f, _):
        f2, av1, av2 = double_step(
            f, obst_f, n_fluid, params, interpret=interpret
        )
        f4, av3, av4 = double_step(
            f2, obst_f, n_fluid, params, interpret=interpret
        )
        return f4, jnp.stack([av1, av2, av3, av4])

    f, av_quads = jax.lax.scan(body, f0, None, length=iters // 4)
    av = av_quads.reshape(-1)
    if (iters % 4) >= 2:
        f, av1, av2 = double_step(f, obst_f, n_fluid, params, interpret=interpret)
        av = jnp.concatenate([av, jnp.stack([av1, av2])])
    if iters % 2:
        obst8 = pallas_step.prepare_obstacles(obstacles)
        f, av_last = pallas_step.pallas_fused_step(
            f, obst8, n_fluid, params, interpret=interpret
        )
        av = jnp.concatenate([av, av_last[None]])
    return f, av
