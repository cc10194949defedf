"""Shard-local Pallas step: the 1-step kernel without periodic wrap.

Used by parallel.halo inside ``shard_map``: each device runs this kernel
over its local row slab, with the two boundary rows delivered explicitly
(they arrive by ring ``ppermute`` over ICI, which also supplies the global
periodicity — see parallel/halo.py).  Differences from ops.pallas_step:

* no wrap operand and no modular indices — the top halo of local tile 0
  and the bottom halo of the last local tile are the ``top_halo`` /
  ``bot_halo`` operands (each a full (9, 1, nx) array, which satisfies
  Mosaic's tile rule by matching the array dims);
* the forcing row is dynamic: global row ny-2 lands on one shard at a
  local row index delivered as an SMEM scalar (-1 elsewhere since the
  body is traced once for all shards under SPMD); the masked update is
  predicated to the one tile containing it;
* x-axis periodicity is global and stays a lane rotate (x is unsharded).

The physics is ops.kernel_common, bit-identical to the other backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice
from advanced_hpc_lbm_tpu.ops.pallas_step import (
    MASK_DTYPE, _NORTH, _SOUTH, _pick_tile_rows,
)
from advanced_hpc_lbm_tpu.params import LBMParams

_LANE = 128


def supported(ny_local: int, nx: int) -> bool:
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return (
        on_tpu
        and nx % _LANE == 0
        and ny_local % 8 == 0
        and ny_local >= 8
        and _pick_tile_rows(ny_local, nx) is not None
    )


def _local_kernel(
    accel_ref, f_ref, bot4_ref, bot7_ref, bot8_ref, top_halo_ref,
    bot_halo_ref, obst_ref, out_ref, tot_ref, top_scr, bot_scr,
    *, params: LBMParams, ty: int, ny: int, nx: int,
):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    zero = jnp.float32(0.0)
    bot = dict(zip(_SOUTH, (bot4_ref, bot7_ref, bot8_ref)))
    nrow = {k: r for r, k in enumerate(_NORTH)}
    srow = {k: r for r, k in enumerate(_SOUTH)}

    obst = obst_ref[...].astype(jnp.float32) != 0.0

    # top halo: parked row from the previous tile, or the neighbor-supplied
    # row for the first tile (only north-movers pull from below)
    @pl.when(i == 0)
    def _use_top_halo():
        for k in _NORTH:
            top_scr[nrow[k]] = top_halo_ref[k]

    # bottom halo: row 0 of the pipelined per-plane 8-row blocks for
    # interior tiles (only south-movers need it — 3x less halo traffic),
    # the neighbor-supplied row for the last tile (whose blocked fetch is
    # clamped and ignored)
    @pl.when(i < n_tiles - 1)
    def _bot_from_block():
        for k in _SOUTH:
            bot_scr[srow[k]] = bot[k][0, 0:1, :]

    @pl.when(i == n_tiles - 1)
    def _bot_from_halo():
        for k in _SOUTH:
            bot_scr[srow[k]] = bot_halo_ref[k]

    # ---- forcing: the global row ny-2 lives at local row accel_ref[0,0]
    # (or -1 on shards that don't own it); only its tile pays ----
    accel_row = accel_ref[0, 0]

    @pl.when(accel_row // ty == i)
    def _apply_forcing():
        w1, w2 = params.accel_w1, params.accel_w2
        rowids = jax.lax.broadcasted_iota(jnp.int32, (ty, nx), 0) + i * ty
        ok = (
            (rowids == accel_row)
            & jnp.logical_not(obst)
            & (f_ref[3] - w1 > 0.0)
            & (f_ref[6] - w2 > 0.0)
            & (f_ref[7] - w2 > 0.0)
        )
        for k, dv in ((1, w1), (5, w2), (8, w2), (3, -w1), (6, -w2), (7, -w2)):
            f_ref[k] = f_ref[k] + jnp.where(ok, jnp.float32(dv), zero)

    # ---- pull streaming (x stays periodic-global: lane rotate) ----
    def stream(k: int) -> jax.Array:
        cy, cx = int(lattice.CY[k]), int(lattice.CX[k])
        if cy == 1:
            rows = jnp.concatenate(
                [top_scr[nrow[k]], f_ref[k][: ty - 1]], axis=0
            )
        elif cy == -1:
            rows = jnp.concatenate([f_ref[k][1:], bot_scr[srow[k]]], axis=0)
        else:
            rows = f_ref[k]
        if cx:
            rows = pltpu.roll(rows, cx % nx, axis=1)
        return rows

    streamed = [stream(k) for k in range(lattice.NSPEEDS)]

    # park this tile's last pre-step row for the next tile (the forcing row
    # is never a tile's last row when it exists: local row ny_loc-2 with
    # ty | ny_loc and ty >= 4)
    for k in _NORTH:
        top_scr[nrow[k]] = f_ref[k, ty - 1 : ty, :]

    out_planes, u_sq = kernel_common.collide(streamed, obst, params)
    for k in range(lattice.NSPEEDS):
        out_ref[k] = out_planes[k]
    tot_ref[i, 0] = jnp.sum(jnp.where(obst, zero, jnp.sqrt(u_sq)))


@functools.lru_cache(maxsize=16)
def _build_call(params: LBMParams, ny: int, nx: int, ty: int, interpret: bool):
    grid = (ny // ty,)
    kernel = functools.partial(_local_kernel, params=params, ty=ty, ny=ny, nx=nx)
    vm = pltpu.VMEM
    last_block = (ny - 8) // 8

    def _bot_spec(k):
        return pl.BlockSpec(
            (1, 8, nx),
            lambda i, _k=k: (
                _k, jnp.minimum(((i + 1) * ty) // 8, last_block), 0
            ),
            memory_space=vm,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            *[_bot_spec(k) for k in _SOUTH],
            pl.BlockSpec((9, 1, nx), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((9, 1, nx), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, 1, nx), jnp.float32),  # parked/top rows (_NORTH)
            pltpu.VMEM((3, 1, nx), jnp.float32),  # bottom rows (_SOUTH)
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(120 * ny * nx),
            bytes_accessed=int(74 * ny * nx),
            transcendentals=int(ny * nx),
        ),
        interpret=interpret,
    )


# x-moving planes and the slot their pre-shifted halo column occupies in
# the (6, ly, 1) halo-columns operand of the 2-D kernel (see local_step_2d)
_XCOL_PLANES = (1, 5, 8, 3, 6, 7)  # cx=+1 pull left; cx=-1 pull right
_XCOL_SLOT = {k: j for j, k in enumerate(_XCOL_PLANES)}


def _local2d_kernel(
    accel_ref, f_ref, bot4_ref, bot7_ref, bot8_ref, top_halo_ref,
    bot_halo_ref, cols_ref, obst_ref, out_ref, tot_ref, top_scr, bot_scr,
    *, params: LBMParams, ty: int, ny: int, nx: int,
):
    """Row-slab tiles over a shard whose domain is cut in BOTH axes: the
    y machinery is _local_kernel's (slim per-plane bottom halos); the x
    edges splice in pre-shifted halo columns instead of a periodic lane
    rotate (the columns arrive already y-aligned per plane, so corners
    need no special handling)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    zero = jnp.float32(0.0)
    bot = dict(zip(_SOUTH, (bot4_ref, bot7_ref, bot8_ref)))
    nrow = {k: r for r, k in enumerate(_NORTH)}
    srow = {k: r for r, k in enumerate(_SOUTH)}

    obst = obst_ref[...].astype(jnp.float32) != 0.0

    @pl.when(i == 0)
    def _use_top_halo():
        for k in _NORTH:
            top_scr[nrow[k]] = top_halo_ref[k]

    @pl.when(i < n_tiles - 1)
    def _bot_from_block():
        for k in _SOUTH:
            bot_scr[srow[k]] = bot[k][0, 0:1, :]

    @pl.when(i == n_tiles - 1)
    def _bot_from_halo():
        for k in _SOUTH:
            bot_scr[srow[k]] = bot_halo_ref[k]

    accel_row = accel_ref[0, 0]

    @pl.when(accel_row // ty == i)
    def _apply_forcing():
        w1, w2 = params.accel_w1, params.accel_w2
        rowids = jax.lax.broadcasted_iota(jnp.int32, (ty, nx), 0) + i * ty
        ok = (
            (rowids == accel_row)
            & jnp.logical_not(obst)
            & (f_ref[3] - w1 > 0.0)
            & (f_ref[6] - w2 > 0.0)
            & (f_ref[7] - w2 > 0.0)
        )
        for k, dv in ((1, w1), (5, w2), (8, w2), (3, -w1), (6, -w2), (7, -w2)):
            f_ref[k] = f_ref[k] + jnp.where(ok, jnp.float32(dv), zero)

    def stream(k: int) -> jax.Array:
        cy, cx = int(lattice.CY[k]), int(lattice.CX[k])
        if cy == 1:
            rows = jnp.concatenate(
                [top_scr[nrow[k]], f_ref[k][: ty - 1]], axis=0
            )
        elif cy == -1:
            rows = jnp.concatenate([f_ref[k][1:], bot_scr[srow[k]]], axis=0)
        else:
            rows = f_ref[k]
        if cx == 1:  # pull from x-1: splice the left halo column at x=0
            col = cols_ref[_XCOL_SLOT[k]]
            rows = jnp.concatenate([col, rows[:, : nx - 1]], axis=1)
        elif cx == -1:  # pull from x+1: splice the right halo column
            col = cols_ref[_XCOL_SLOT[k]]
            rows = jnp.concatenate([rows[:, 1:], col], axis=1)
        return rows

    streamed = [stream(k) for k in range(lattice.NSPEEDS)]

    for k in _NORTH:
        top_scr[nrow[k]] = f_ref[k, ty - 1 : ty, :]

    out_planes, u_sq = kernel_common.collide(streamed, obst, params)
    for k in range(lattice.NSPEEDS):
        out_ref[k] = out_planes[k]
    tot_ref[i, 0] = jnp.sum(jnp.where(obst, zero, jnp.sqrt(u_sq)))


@functools.lru_cache(maxsize=16)
def _build_call_2d(
    params: LBMParams, ny: int, nx: int, ty: int, interpret: bool
):
    grid = (ny // ty,)
    kernel = functools.partial(
        _local2d_kernel, params=params, ty=ty, ny=ny, nx=nx
    )
    vm = pltpu.VMEM
    last_block = (ny - 8) // 8

    def _bot_spec(k):
        return pl.BlockSpec(
            (1, 8, nx),
            lambda i, _k=k: (
                _k, jnp.minimum(((i + 1) * ty) // 8, last_block), 0
            ),
            memory_space=vm,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            *[_bot_spec(k) for k in _SOUTH],
            pl.BlockSpec((9, 1, nx), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((9, 1, nx), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((6, ty, 1), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, 1, nx), jnp.float32),
            pltpu.VMEM((3, 1, nx), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(120 * ny * nx),
            bytes_accessed=int(74 * ny * nx),
            transcendentals=int(ny * nx),
        ),
        interpret=interpret,
    )


def local_step_2d(
    f_local: jax.Array,
    top_halo: jax.Array,
    bot_halo: jax.Array,
    halo_cols: jax.Array,
    obstacles_local: jax.Array,
    accel_local_row: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One non-periodic step on a (ly, lx) shard of a 2-D torus.

    Args:
      f_local: (9, ly, lx) distributions of this shard.
      top_halo / bot_halo: (9, 1, lx) neighbor rows (global y-1 / y+ly).
      halo_cols: (6, ly, 1) pre-shifted halo columns, one per x-moving
        plane in _XCOL_PLANES order: for plane k with displacement
        (cy, cx), slot j holds column x-cx of the row-extended neighbor
        edge sliced at rows [1-cy, 1-cy+ly) — i.e. exactly the values the
        pull stream needs at this shard's x edge, corners included
        (built by parallel.halo._local_pallas_step_2d).
      obstacles_local: (ly, lx) int8/bool mask.
      accel_local_row: int32 scalar — local index of global row ny-2, or
        -1 if this shard doesn't own it.

    Returns (f_next_local, tot_u_local).
    """
    _, ny_local, nx_local = f_local.shape
    ty = _pick_tile_rows(ny_local, nx_local)
    if ty is None or nx_local % _LANE:
        raise ValueError(
            f"local shard {ny_local}x{nx_local} not tileable for the 2-D "
            "local kernel"
        )
    if obstacles_local.dtype != MASK_DTYPE:
        obstacles_local = obstacles_local.astype(MASK_DTYPE)
    accel = jnp.asarray(accel_local_row, jnp.int32).reshape(1, 1)
    call = _build_call_2d(params, ny_local, nx_local, ty, interpret)
    f_next, tots = call(
        accel, f_local, f_local, f_local, f_local, top_halo, bot_halo,
        halo_cols, obstacles_local,
    )
    return f_next, jnp.sum(tots)


# ---------------------------------------------------------------------------
# Communication-avoiding K-step local kernel (ghost-zone trapezoid per shard)
# ---------------------------------------------------------------------------

_CA_VMEM_BUDGET = 80 * 1024 * 1024
_CA_VMEM_LIMIT = 100 * 1024 * 1024


def ca_supported(ny_local: int, nx: int, k: int) -> bool:
    """The CA kernel holds the whole ±K ghost window in VMEM (one operand
    + two ping-pong scratch buffers + the own-rows output + masks) — it
    targets exactly the thin-slab regime where exchange latency dominates,
    and those windows are small.  Gate on the VMEM budget."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    r = ny_local + 2 * k
    est = (
        3 * 9 * r * nx * 4  # window operand + 2 scratch
        + 9 * ny_local * nx * 4  # own-rows output
        + 2 * r * nx * 4  # obstacle + forcing mask planes
        + 5 * r * nx * 4  # lean step live temporaries (rho/u_x/u_y/u_sq/base)
    )
    return (
        on_tpu
        and 2 <= k <= 8
        and nx % _LANE == 0
        and ny_local % 8 == 0
        and ny_local >= 2 * k
        and est <= _CA_VMEM_BUDGET
    )


def _local_ca_kernel(
    w_ref, obst_ref, accel_ref, out_ref, tot_ref, wa, wb,
    *, params: LBMParams, k: int, ly: int, nx: int,
):
    """K steps on the (9, ly+2K, nx) ghost-extended window of one shard —
    the wire analogue of ops.pallas_k._kernel_k_lean with all the periodic
    machinery removed: ghosts arrive as operand rows (shipped by ring
    ppermute in parallel.halo), every step runs over the FULL window with
    wrapping rolls whose garbage lands exactly in the rows the trapezoid
    invalidates, and the forcing rows come in as a precomputed 0/1 plane
    (the global forcing row can appear TWICE in a window — as a shard's
    own row and as another's ghost image — so a mask, not an index).
    Liveness-lean step body, same fp op order as kernel_common.collide."""
    zero = jnp.float32(0.0)
    T = ly + 2 * k

    w_obst = obst_ref[...] != 0.0
    accel_T = accel_ref[...] != 0.0
    obst_own = jax.lax.slice_in_dim(obst_ref[...], k, k + ly, axis=0) != 0.0

    for s in range(k):
        src = w_ref if s == 0 else (wa if s % 2 == 1 else wb)
        dst = wa if s % 2 == 0 else wb
        u_sq = kernel_common.lean_window_step(
            src, dst, w_obst, accel_T, params, T, nx
        )
        norm = jnp.sqrt(jax.lax.slice_in_dim(u_sq, k, k + ly, axis=0))
        tot_ref[0, s] = jnp.sum(jnp.where(obst_own, zero, norm))

    final = wa if k % 2 == 1 else wb
    for kk in range(lattice.NSPEEDS):
        out_ref[kk] = jax.lax.slice_in_dim(final[kk], k, k + ly, axis=0)


@functools.lru_cache(maxsize=16)
def _build_call_ca(
    params: LBMParams, ly: int, nx: int, k: int, interpret: bool
):
    r = ly + 2 * k
    kernel = functools.partial(
        _local_ca_kernel, params=params, k=k, ly=ly, nx=nx
    )
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((9, r, nx), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((r, nx), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((r, nx), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((9, ly, nx), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ly, nx), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, r, nx), jnp.float32),
            pltpu.VMEM((9, r, nx), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(130 * k * r * nx),
            bytes_accessed=int((36 * (2 * r + ly) + 8 * r) * nx),
            transcendentals=int(k * r * nx),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_CA_VMEM_LIMIT
        ),
        interpret=interpret,
    )


def local_ca_steps(
    window: jax.Array,
    obst_window_f32: jax.Array,
    accel_window_f32: jax.Array,
    params: LBMParams,
    k: int,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance a shard K steps from its ±K ghost-extended window.

    Args:
      window: (9, ly+2K, nx) pre-step distributions — own rows [K, K+ly)
        plus K neighbor rows each side (delivered by ring ppermute).
      obst_window_f32 / accel_window_f32: (ly+2K, nx) fp32 0/1 planes —
        the window-extended obstacle mask and forcing-row (global ny-2)
        mask, loop-invariant (build once per run).
      params: static run parameters.
      k: ghost depth = steps per exchange.

    Returns (f_own (9, ly, nx), tots (k,)) — per-step ||u|| partial sums
    over the shard's own fluid cells (psum and divide outside).
    """
    _, r, nx = window.shape
    ly = r - 2 * k
    call = _build_call_ca(params, ly, nx, k, interpret)
    f_own, tots = call(window, obst_window_f32, accel_window_f32)
    return f_own, tots[0]


def local_step(
    f_local: jax.Array,
    top_halo: jax.Array,
    bot_halo: jax.Array,
    obstacles_local: jax.Array,
    accel_local_row: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One non-periodic step on a local slab.

    Args:
      f_local: (9, ny_local, nx) distributions of this shard.
      top_halo: (9, 1, nx) — the row just below (global y-1), pre-step.
      bot_halo: (9, 1, nx) — the row just above (global y+ny_local).
      obstacles_local: (ny_local, nx) int8/bool mask.
      accel_local_row: int32 scalar — local index of global row ny-2, or
        -1 if this shard doesn't own it.
      params: static run parameters.

    Returns (f_next_local, tot_u_local).
    """
    _, ny_local, nx = f_local.shape
    ty = _pick_tile_rows(ny_local, nx)
    if ty is None or nx % _LANE:
        raise ValueError(
            f"local slab {ny_local}x{nx} not tileable for the local kernel"
        )
    if obstacles_local.dtype != MASK_DTYPE:
        obstacles_local = obstacles_local.astype(MASK_DTYPE)
    accel = jnp.asarray(accel_local_row, jnp.int32).reshape(1, 1)
    call = _build_call(params, ny_local, nx, ty, interpret)
    f_next, tots = call(
        accel, f_local, f_local, f_local, f_local, top_halo, bot_halo,
        obstacles_local,
    )
    return f_next, jnp.sum(tots)
