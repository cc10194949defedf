"""Hand-tiled Pallas/Mosaic kernel for the fused D2Q9-BGK timestep.

This is the speed-of-light path (SURVEY.md section 7 step 4).  The step is
HBM-bandwidth-bound: the roofline is one read + one write of the 9 fp32
planes plus one int8 obstacle read per cell per step (73 B/cell).  The
XLA-fused jnp path materializes the streamed intermediate and several
temporaries; this kernel touches each plane exactly once in and once out.

Design (vs the reference's ``timestep_new2``, d2q9-bgk.c:228-1813):

* grid over row-slabs of TY rows, executed sequentially bottom-to-top;
  each program's main operand is its (9, TY, nx) block, pipelined by
  Mosaic with automatic double buffering;
* **halo reads cost three 8-row single-plane blocks per tile, not a
  full-plane stack**: the north (top) halo of tile i+1 is the last row of
  tile i's input block, which tile i parks in a persistent VMEM scratch
  (scratch survives across the sequential grid) — only the three
  north-moving planes {2,5,6} are parked, because only they pull from
  below.  The south (bottom) halo — a row of a *future* tile — is needed
  only by the three south-moving planes {4,7,8}, fetched as three
  Mosaic-pipelined (1, 8, nx) blocks containing it (single-row slices of
  tiled fp32 are not DMA-able; 8 rows is the sublane granule).  Tile 0's
  top halo is the periodic wrap row ny-1, read for planes {2,5,6} from
  three constant-index 8-row operands that block-revisiting fetches only
  once per step.  The wrap that cost the reference a 1500-line 9-way loop
  peel (d2q9-bgk.c:262-1810) is a modular block index here.  Slimming the
  halos to the planes that use them (round 2) cut the halo read traffic
  3x and freed enough VMEM for ty=16 tiles at nx=4096 (previously ty=8,
  which doubled read traffic and halved throughput);
* x-axis periodic wrap is a lane rotate (pltpu.roll) in VMEM;
* the acceleration row (global ny-2) is applied by the last program only
  (``pl.when``), as a masked in-place update of its VMEM input copy — for
  TY >= 4 that row is never a halo row of any tile, so no cross-tile
  coupling;
* bounce-back is a predicated select against the opposite-speed streamed
  values, exactly the reflected pull of d2q9-bgk.c:971-981;
* equilibria are computed pairwise (opposite speeds share their even
  part), and the per-step ||u|| reduction reuses the *pre*-collision
  moments: BGK conserves rho and momentum exactly, so the post-collision
  moments the reference recomputes (d2q9-bgk.c:1103-1130) are identical up
  to fp rounding (~1e-7 rel — invisible at the checker's 1% contract).

Everything is fp32.  Measured on one TPU v5e chip this sustains
11.5-12.1 GLUPS at 1024x1024 (86.6-90.8 us/step — at the 73 B/cell HBM
roofline; ~330x the reference's optimized serial C).  See BENCH.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice
from advanced_hpc_lbm_tpu.params import LBMParams

# obstacle mask dtype fed to the kernel; int8 keeps the extra HBM stream at
# 1 B/cell (vs 4 for an fp32 mask)
MASK_DTYPE = jnp.int8

_LANE = 128


def _pick_tile_rows(ny: int, nx: int = 1024) -> int | None:
    """Largest row-slab height that divides ny, fits the double-buffered
    in+out blocks in VMEM, keeps the forcing row interior to its slab
    (TY >= 4) and is a multiple of the 8-row sublane tile.
    LBM_PALLAS_TY env var overrides for tuning."""
    override = os.environ.get("LBM_PALLAS_TY")
    if override:
        ty = int(override)
        return ty if ny % ty == 0 and ty % 8 == 0 else None
    # VMEM: 2 buffers x (in + out) x 9 planes x ty x nx x 4B = 144*ty*nx,
    # plus six double-buffered (1, 8, nx) halo/wrap blocks (384*nx), the
    # int8 mask (2*ty*nx) and the parked-row scratch (12*nx).  Mosaic's
    # default scoped-VMEM limit is ~10 MB but the chip has >= ~100 MB;
    # the kernel raises the limit (CompilerParams) and budgets 64 MB of
    # buffers — ty=64 everywhere up to nx=4096, 32 at nx=8192.
    halo_fixed = 6 * 2 * 8 * nx * 4
    budget_rows = ((64 * 1024 * 1024 - halo_fixed) // (146 * nx)) // 8 * 8
    for ty in (64, 32, 16, 8):
        if ny % ty == 0 and ty <= budget_rows:
            return ty
    return None


# planes that pull from the row below (need the parked/wrap top halo) and
# from the row above (need the fetched bottom halo): lattice numbering
# d2q9-bgk.c:7-13
_NORTH = tuple(int(k) for k in np.flatnonzero(lattice.CY == 1))  # (2, 5, 6)
_SOUTH = tuple(int(k) for k in np.flatnonzero(lattice.CY == -1))  # (4, 7, 8)


def supported(ny: int | None = None, nx: int | None = None) -> bool:
    """Whether the Pallas kernel can run: TPU backend + tileable shape."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    if not on_tpu:
        return False
    if ny is None or nx is None:
        return True
    return _pick_tile_rows(ny, nx) is not None and nx % _LANE == 0 and ny >= 8


def _step_kernel(
    f_ref, bot4_ref, bot7_ref, bot8_ref, wrap2_ref, wrap5_ref, wrap6_ref,
    obst_ref, out_ref, tot_ref, top_scr,
    *, params: LBMParams, ty: int, ny: int, nx: int,
):
    i = pl.program_id(0)
    w1 = params.accel_w1
    w2 = params.accel_w2
    zero = jnp.float32(0.0)
    bot = dict(zip(_SOUTH, (bot4_ref, bot7_ref, bot8_ref)))
    wrap = dict(zip(_NORTH, (wrap2_ref, wrap5_ref, wrap6_ref)))
    scr_row = {k: r for r, k in enumerate(_NORTH)}

    # tile 0 has no predecessor to park its top halo: take the periodic
    # wrap row ny-1 from the constant-index wrap operands (row 7 of the
    # last 8-row block; fetched from HBM once per step thanks to
    # revisiting).  Only the north-moving planes pull from below.
    @pl.when(i == 0)
    def _load_wrap_row():
        for k in _NORTH:
            top_scr[scr_row[k]] = wrap[k][0, 7:8, :]

    # compare in fp32 so the predicate inherits the (8,128) fp32 layout —
    # an int8-born i1 vector trips a Mosaic relayout ("replicated in
    # destination but not in source") when mixed with fp32 selects
    obst = obst_ref[...].astype(jnp.float32) != 0.0  # (TY, nx) bool

    # ---- acceleration forcing on global row ny-2 (d2q9-bgk.c:239-260) ----
    # Row ny-2 is interior to the LAST slab (ty >= 4 and ty | ny), so only
    # that program pays for the masked update; it mutates its own VMEM
    # input copy in place before streaming.
    @pl.when(i == pl.num_programs(0) - 1)
    def _apply_forcing():
        rowids = jax.lax.broadcasted_iota(jnp.int32, (ty, nx), 0) + i * ty
        ok = (
            (rowids == ny - 2)
            & jnp.logical_not(obst)
            & (f_ref[3] - w1 > 0.0)
            & (f_ref[6] - w2 > 0.0)
            & (f_ref[7] - w2 > 0.0)
        )
        for k, dv in ((1, w1), (5, w2), (8, w2), (3, -w1), (6, -w2), (7, -w2)):
            f_ref[k] = f_ref[k] + jnp.where(ok, jnp.float32(dv), zero)

    # ---- pull streaming from the haloed window (d2q9-bgk.c:988-998) ----
    # Top halo = previous tile's parked last row (VMEM scratch persists
    # across the sequential grid); bottom halo = row 0 of the pipelined
    # 8-row block starting at global row (i+1)*ty (mod ny).
    def stream(k: int) -> jax.Array:
        cy, cx = int(lattice.CY[k]), int(lattice.CX[k])
        if cy == 1:  # north-moving: pull from the row below (top halo)
            rows = jnp.concatenate(
                [top_scr[scr_row[k]], f_ref[k][: ty - 1]], axis=0
            )
        elif cy == -1:  # south-moving: pull from the row above (bottom halo)
            rows = jnp.concatenate([f_ref[k][1:], bot[k][0, 0:1, :]], axis=0)
        else:
            rows = f_ref[k]
        if cx:
            # pltpu.roll wants a non-negative shift; rotating by nx-1
            # equals rotating by -1 on the periodic lane axis
            rows = pltpu.roll(rows, cx % nx, axis=1)
        return rows

    streamed = [stream(k) for k in range(lattice.NSPEEDS)]

    # ---- park this tile's last input row as the next tile's top halo ----
    # (pre-step values; the forcing row ny-2 is never a tile's last row.
    # The reads of top_scr in stream() trace before these writes, and the
    # grid is sequential, so ordering is safe.)
    for k in _NORTH:
        top_scr[scr_row[k]] = f_ref[k, ty - 1 : ty, :]

    # ---- BGK relax + bounce-back (shared routine; d2q9-bgk.c:1033-1100,
    # :971-981) ----
    out_planes, u_sq = kernel_common.collide(streamed, obst, params)
    for k in range(lattice.NSPEEDS):
        out_ref[k] = out_planes[k]

    # ---- reduction (d2q9-bgk.c:1103-1130) ----
    # BGK conserves rho and momentum exactly, so the post-collision moments
    # the reference recomputes equal the pre-collision ones; reuse u_sq.
    # tot_ref is the full (grid, 1) SMEM array (revisited by every program;
    # a (1,1) block would violate Mosaic's min-tile rule when grid > 1).
    norm = jnp.sqrt(u_sq)
    tot_ref[i, 0] = jnp.sum(jnp.where(obst, zero, norm))


@functools.lru_cache(maxsize=32)
def _build_pallas_call(
    params: LBMParams, ny: int, nx: int, ty: int, interpret: bool
):
    grid = (ny // ty,)
    kernel = functools.partial(
        _step_kernel, params=params, ty=ty, ny=ny, nx=nx
    )
    # bottom halo: the 8-row block holding global row (i+1)*ty mod ny —
    # one (1, 8, nx) block per south-moving plane (the only consumers)
    def _bot_spec(k):
        return pl.BlockSpec(
            (1, 8, nx),
            lambda i, _k=k: (_k, (((i + 1) * ty) % ny) // 8, 0),
            memory_space=pltpu.VMEM,
        )

    # wrap block (rows ny-8..ny-1), constant index => fetched once — one
    # (1, 8, nx) block per north-moving plane
    def _wrap_spec(k):
        return pl.BlockSpec(
            (1, 8, nx),
            lambda i, _k=k: (_k, (ny - 8) // 8, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            *[_bot_spec(k) for k in _SOUTH],
            *[_wrap_spec(k) for k in _NORTH],
            pl.BlockSpec((ty, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, ty, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, 1), jnp.float32),
        ],
        scratch_shapes=[
            # parked top-halo row, north-moving planes only (order: _NORTH)
            pltpu.VMEM((3, 1, nx), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(120 * ny * nx),
            bytes_accessed=int(74 * ny * nx),
            transcendentals=int(ny * nx),  # the sqrt
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def prepare_obstacles(obstacles: jax.Array) -> jax.Array:
    """Cast the bool mask once, outside the scan, to the kernel dtype."""
    return obstacles.astype(MASK_DTYPE)


def pallas_fused_step(
    f: jax.Array,
    obstacles: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.fused.fused_step backed by the Mosaic
    kernel.  Accepts a bool or pre-cast int8 obstacle mask."""
    _, ny, nx = f.shape
    ty = _pick_tile_rows(ny, nx)
    if ty is None or nx % _LANE:
        raise ValueError(
            f"grid {ny}x{nx} not tileable for the Pallas kernel; "
            "use the 'fused' backend"
        )
    if obstacles.dtype != MASK_DTYPE:
        obstacles = prepare_obstacles(obstacles)
    call = _build_pallas_call(params, ny, nx, ty, interpret)
    f_next, tots = call(f, f, f, f, f, f, f, obstacles)
    return f_next, jnp.sum(tots) / n_fluid


pallas_fused_step.prepare_obstacles = prepare_obstacles
# signals ops.fused.run_simulation to use the copy-free paired scan body
pallas_fused_step.opaque_custom_call = True
