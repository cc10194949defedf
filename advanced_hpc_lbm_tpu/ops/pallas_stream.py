"""HBM-streaming K-step kernel: manual DMA pipeline, minimal VMEM.

The auto-pipelined K-step kernel (ops.pallas_k) spends most of its VMEM on
Mosaic's double-buffered operand/output blocks (4 x 36*ty*nx) ON TOP of the
two lean ping-pong windows the trapezoid actually computes in — which caps
ty (the seam-recompute divisor, 2K/ty) well below what the chip could hold:
every raised-limit config fails to compile (BENCH.md round-3 probe).  This
kernel drops the pipelined blocks entirely: the distribution arrays stay in
HBM (``pl.ANY``), each grid step DMAs its ±K ghost window into one of two
hand-double-buffered VMEM windows (ingress for tile i+1 overlaps tile i's
compute), runs K liveness-lean steps ping-ponging against a shared scratch
window, and DMAs its own rows straight back out.  VMEM per tile is 3
windows + 2 mask windows ≈ 116 B * (ty+2K) * nx — half of pallas_k's
budget — so ty=128 fits at 4096² (seam 2K/ty = 12.5%) and grids whose two
HBM buffers barely fit the chip (12288²) can run at all: the kernel adds
only ~70 MB of VMEM and zero XLA transients.

**Wrap-row padding.**  The state rides between calls as a (9, ny+2K, nx)
array whose first/last K rows duplicate the periodic wrap rows, so every
tile's ingress is ONE contiguous affine-offset DMA — measured constraint:
the remote Mosaic compiler accepts DMA slice offsets that are affine in
the grid index (``i*ty ± K``) but rejects ``%``/``jnp.where`` offset
arithmetic and the multi-chunk pl.when-branched ingress assembling a
wrap window in place (bisected on hardware, /tmp/stream_stage*.py round
3).  The kernel maintains the padding itself: tile 0 additionally writes
its first K rows to the bottom pad and tile n-1 its last K rows to the
top pad, so the output is again a valid padded state and a whole
``lax.scan`` runs with zero XLA-level re-padding.

K is fixed at 8: with ty % 8 == 0 every ingress/egress row offset lands
on the fp32 tile granule, which the DMA engine requires (CLAUDE.md: no
sub-granule row slices of tiled fp32).

Physics per step is kernel_common.lean_window_step — bit-identical to
ops.pallas_k's lean body (same trapezoid wrap-garbage scheme, same forcing
mask with mod-ny row ids, same pre-collision ||u|| reduction).
Reference parity: d2q9-bgk.c:228-1813, run K at a time.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advanced_hpc_lbm_tpu.ops import kernel_common, lattice, pallas_step
from advanced_hpc_lbm_tpu.params import LBMParams

_LANE = 128
K = 8  # ghost depth = steps per pass; 8 == the fp32 DMA row granule

# 3 f windows + 2 f32 mask windows, plus slack for Mosaic temporaries.
_VMEM_LIMIT = 120 * 1024 * 1024
_WINDOW_BUDGET = 112 * 1024 * 1024


def _pick_tile_rows(ny: int, nx: int) -> int | None:
    """Largest 8-multiple row count dividing ny whose 3 f windows + 2 mask
    windows + the step's live temporaries fit the budget.  Bigger ty =>
    smaller seam recompute 2K/ty.

    The 24 B/row temporary term is measured, not theoretical: at 12288²
    ty=64 the windows alone fit (116 B/row = 114 MB) but the compiled
    program carried 23.5 MB of register-allocator spill slots — the lean
    step's ~6 live (T, nx) planes (rho/u_x/u_y/u_sq/base/pair temps) —
    and OOM'd VMEM at 132.3/128 MB.  Charging them picks ty=48 there,
    which compiles; every benchmarked size (2048²-8192²) keeps its tile."""
    override = os.environ.get("LBM_STREAM_TY")
    if override:
        ty = int(override)
        return ty if ny % ty == 0 and ty % 8 == 0 else None
    # ty=8 (= K) is the last resort: legal (the contract is ty >= K) and
    # needed for the thinnest shard slabs (ly=8 on wide meshes), but any
    # larger divisor wins first — at ty=8 the seam recompute is 2K/ty=2x.
    for ty in (256, 192, 128, 96, 64, 48, 32, 24, 16, 8):
        if ny % ty:
            continue
        t = ty + 2 * K
        need = (3 * 9 * 4 + 2 * 4 + 6 * 4) * t * nx  # 140 B per window row
        if need <= _WINDOW_BUDGET and ty >= K:
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
        and ny >= 2 * K
        and _pick_tile_rows(ny, nx) is not None
    )


def _kernel(
    f_pad, om_pad, out_pad, tot_ref,
    p0, p1, d_scr, m0, m1, stash,
    sem_f0, sem_f1, sem_m0, sem_m1, sem_o0, sem_o1,
    *, params: LBMParams, ty: int, ny: int, nx: int, inplace: bool,
    trapezoid: bool,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    zero = jnp.float32(0.0)
    T = ty + 2 * K

    def ingress(j, pbuf, mbuf, sf, sm, start: bool):
        """Tile j's ±K window = padded rows [j*ty, j*ty + T): one
        contiguous affine-offset DMA per operand.  Start and wait
        reconstruct identical descriptors."""
        cf = pltpu.make_async_copy(
            f_pad.at[:, pl.ds(j * ty, T), :], pbuf, sf
        )
        cm = pltpu.make_async_copy(
            om_pad.at[pl.ds(j * ty, T), :], mbuf, sm
        )
        if start:
            cf.start()
            cm.start()
        else:
            cf.wait()
            cm.wait()

    def egress_main(j, pbuf, so):
        return pltpu.make_async_copy(
            pbuf.at[:, K : K + ty, :],
            out_pad.at[:, pl.ds(K + j * ty, ty), :],
            so,
        )

    def tile_body(pbuf, mbuf, sf, sm, so, so_other, pother, mother, sf_o, sm_o):
        """One tile on a statically-chosen window buffer pair.

        Two schedules share this body.  Out-of-place (two HBM buffers):
        egress(i) starts at the end of iteration i and is drained two
        compute steps into iteration i+1.  In-place (out_pad ALIASES
        f_pad, one HBM buffer): egress(i) may not start until
        ingress(i+1) has COMPLETED — they overlap on K rows, and tile
        i+1 must read the OLD values — so it starts at the top of
        iteration i+1 (right after that wait) and drains two steps
        later; the wrap pads, which every later tile's ingress still
        needs old images of, are deferred to the LAST iteration (tile
        0's new first-K rows ride in the ``stash`` scratch).  Every
        write-read overlap pair is separated by an in-program wait; the
        sequential interpret mode executes the same order, so oracle
        equivalence there validates the schedule."""
        # my ingress was started by tile i-1 (or just now for i == 0)
        ingress(i, pbuf, mbuf, sf, sm, start=False)

        if inplace:
            # safe now: my window (the only old-value reader of tile
            # i-1's K-row overlap) is fully in VMEM
            @pl.when(i >= 1)
            def _start_prev_egress():
                egress_main(i - 1, pother, so_other).start()

        # the mask plane is ENCODED (encode_masks): +1 obstacle, +2
        # forcing row, +4 reduction-excluded — decoded with f32 compares
        # (int-born bools hit Mosaic relayout errors, CLAUDE.md).
        # Carrying the forcing rows as data instead of iota row-ids is
        # what lets the SAME kernel run both the periodic single-chip
        # state (forcing at global row ny-2, incl. its pad images) and a
        # ring-exchanged shard window (forcing wherever the shard's slice
        # of the global mask says).  The +4 flag (x-ghost columns of a
        # 2-D torus shard window, window_ca_steps_2d) keeps TRUE dynamics
        # for those cells — the x-neighbor's obstacle/forcing bits ride
        # in the low bits — but masks them out of the ||u|| reduction:
        # they are the x-neighbor's own (already-counted) cells and turn
        # to trapezoid garbage near the window edge.
        m = mbuf[...]
        excl = m >= 4.0
        m = m - jnp.where(excl, jnp.float32(4.0), zero)
        w_obst = (m == 1.0) | (m == 3.0)
        obst_main = (w_obst | excl)[K : K + ty, :]
        accel_T = m >= 2.0

        def step(s, src, dst):
            if trapezoid:
                # shrinking static-slice window: step s only computes the
                # rows still valid after it, [s+1, T-s-1) — K*(T-K-1)
                # rows total vs K*T for the full-window form (bitwise-
                # equal own rows; kernel_common.lean_window_step_rows)
                lo, hi = s + 1, T - s - 1
                u_sq = kernel_common.lean_window_step_rows(
                    src, dst, w_obst, accel_T, params, T, nx, lo, hi
                )
                norm = jnp.sqrt(
                    jax.lax.slice_in_dim(u_sq, K - lo, K - lo + ty, axis=0)
                )
            else:
                u_sq = kernel_common.lean_window_step(
                    src, dst, w_obst, accel_T, params, T, nx
                )
                norm = jnp.sqrt(
                    jax.lax.slice_in_dim(u_sq, K, K + ty, axis=0)
                )
            tot_ref[i, s] = jnp.sum(jnp.where(obst_main, zero, norm))

        # two steps of compute first: tile i-1's egress (reading pother)
        # gets ~2 steps of wall time to complete, so the drain below
        # never blocks.  Measured vs drain-first: ~parity at
        # 2048^2/4096^2, +1.6% at 8192^2 (the kernel is compute-stall
        # bound, not DMA-bound — BENCH.md round-3 stream table); kept for
        # the structurally bubble-free pipeline.
        src, dst = pbuf, d_scr
        for s in range(2):
            step(s, src, dst)
            src, dst = dst, src

        # the OTHER buffer: drain tile i-1's egress before overwriting
        # it with ingress(i+1), which then overlaps the remaining steps
        @pl.when(i >= 1)
        def _drain_prev_egress():
            egress_main(i - 1, pother, so_other).wait()

        @pl.when(i + 1 < n)
        def _prefetch_next():
            ingress(i + 1, pother, mother, sf_o, sm_o, start=True)

        for s in range(2, K):
            step(s, src, dst)
            src, dst = dst, src
        # K even: the final state sits back in pbuf (src after the swap)

        if not inplace:
            egress_main(i, pbuf, so).start()

            # maintain the wrap padding of the OUTPUT: tile 0's first K
            # own rows are also the high pad (images of global rows
            # [0, K)); the last tile's last K own rows are also the low
            # pad ([ny-K, ny)).  Tiny K-row copies, started+waited
            # in-iteration on the other egress semaphore (idle for this
            # tile's parity by construction).
            @pl.when(i == 0)
            def _high_pad():
                c = pltpu.make_async_copy(
                    pbuf.at[:, K : 2 * K, :],
                    out_pad.at[:, K + ny : K + ny + K, :],
                    so_other,
                )
                c.start()
                c.wait()

            @pl.when(i == n - 1)
            def _low_pad_and_drain():
                c = pltpu.make_async_copy(
                    pbuf.at[:, ty : K + ty, :],
                    out_pad.at[:, 0:K, :],
                    so_other,
                )
                c.start()
                c.wait()
                egress_main(i, pbuf, so).wait()
        else:
            # tile n-1's ingress reads the OLD high pad, so the new one
            # (tile 0's computed first-K rows) must wait until the final
            # iteration — park it in the stash scratch (persists across
            # the sequential grid)
            @pl.when(i == 0)
            def _stash_high_pad():
                stash[...] = pbuf[:, K : 2 * K, :]

            @pl.when(i == n - 1)
            def _finish_inplace():
                # by here every ingress has completed (mine was waited
                # above; earlier tiles' long before), so the remaining
                # writes are hazard-free: own rows, then both wrap pads
                egress_main(i, pbuf, so).start()
                c_low = pltpu.make_async_copy(
                    pbuf.at[:, ty : K + ty, :],
                    out_pad.at[:, 0:K, :],
                    so_other,
                )
                c_low.start()
                c_low.wait()
                c_high = pltpu.make_async_copy(
                    stash,
                    out_pad.at[:, K + ny : K + ny + K, :],
                    so_other,
                )
                c_high.start()
                c_high.wait()
                egress_main(i, pbuf, so).wait()

    @pl.when(i == 0)
    def _first_ingress():
        # pass the traced i (== 0 here) so the descriptor offsets stay
        # traced affine expressions
        ingress(i, p0, m0, sem_f0, sem_m0, start=True)

    @pl.when(i % 2 == 0)
    def _even():
        tile_body(
            p0, m0, sem_f0, sem_m0, sem_o0, sem_o1,
            p1, m1, sem_f1, sem_m1,
        )

    @pl.when(i % 2 == 1)
    def _odd():
        tile_body(
            p1, m1, sem_f1, sem_m1, sem_o1, sem_o0,
            p0, m0, sem_f0, sem_m0,
        )


@functools.lru_cache(maxsize=16)
def _build_call(
    params: LBMParams,
    ny: int,
    nx: int,
    ty: int,
    interpret: bool,
    inplace: bool = False,
    trapezoid: bool = False,
):
    T = ty + 2 * K
    kernel = functools.partial(
        _kernel, params=params, ty=ty, ny=ny, nx=nx, inplace=inplace,
        trapezoid=trapezoid,
    )
    return pl.pallas_call(
        kernel,
        grid=(ny // ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # f, wrap-padded (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # mask f32, wrap-padded
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # f_next, wrap-padded
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny + 2 * K, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, K), jnp.float32),
        ],
        # in-place: f_next IS f (one HBM state buffer total); the kernel
        # runs the hazard-ordered schedule (see tile_body docstring)
        input_output_aliases={0: 0} if inplace else {},
        scratch_shapes=[
            pltpu.VMEM((9, T, nx), jnp.float32),  # window A
            pltpu.VMEM((9, T, nx), jnp.float32),  # window B
            pltpu.VMEM((9, T, nx), jnp.float32),  # shared step scratch
            pltpu.VMEM((T, nx), jnp.float32),  # mask window A
            pltpu.VMEM((T, nx), jnp.float32),  # mask window B
            pltpu.VMEM((9, K, nx), jnp.float32),  # high-pad stash (inplace)
            pltpu.SemaphoreType.DMA(()),  # ingress f, buffer A
            pltpu.SemaphoreType.DMA(()),  # ingress f, buffer B
            pltpu.SemaphoreType.DMA(()),  # ingress mask, buffer A
            pltpu.SemaphoreType.DMA(()),  # ingress mask, buffer B
            pltpu.SemaphoreType.DMA(()),  # egress, buffer A
            pltpu.SemaphoreType.DMA(()),  # egress, buffer B
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(130 * K * ny * nx),
            bytes_accessed=int((36 * (T / ty) + 36 + 4 * (T / ty)) * ny * nx),
            transcendentals=int(K * ny * nx),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def pad_state(f: jax.Array) -> jax.Array:
    """(9, ny, nx) -> (9, ny+2K, nx) with K periodic wrap rows each side."""
    return jnp.concatenate([f[:, -K:, :], f, f[:, :K, :]], axis=1)


def unpad_state(f_pad: jax.Array) -> jax.Array:
    return f_pad[:, K:-K, :]


def encode_masks(obstacles: jax.Array, accel_rows: jax.Array) -> jax.Array:
    """The kernel's single f32 mask plane: +1 obstacle, +2 forcing row.
    ``accel_rows`` is a (ny,) bool row mask (globally: row ny-2,
    d2q9-bgk.c:239-260; on a shard: that row's local slice or all-False)."""
    return (
        (obstacles != 0).astype(jnp.float32)
        + 2.0 * accel_rows.astype(jnp.float32)[:, None]
    )


def prepare_obstacles(obstacles: jax.Array) -> jax.Array:
    """Wrap-padded encoded mask plane for the periodic single-chip form
    (forcing at global row ny-2; the wrap padding carries its pad images
    automatically)."""
    ny = obstacles.shape[0]
    accel_rows = jnp.zeros(ny, bool).at[ny - 2].set(True)
    m = encode_masks(obstacles, accel_rows)
    return jnp.concatenate([m[-K:], m, m[:K]], axis=0)


def initial_state_padded(params: LBMParams) -> jax.Array:
    """Equilibrium-at-rest built DIRECTLY at the wrap-padded shape
    (uniform per-plane values, so padding == interior;
    d2q9-bgk.c:2802-2823).  For grids whose unpadded state alone is a
    large fraction of HBM (16384²+), pad_state(initial_state(...)) would
    hold unpadded + padded together; this never does."""
    d = params.density_f32
    per_speed = jnp.asarray(
        [d * np.float32(4.0 / 9.0)]
        + [d / np.float32(9.0)] * 4
        + [d / np.float32(36.0)] * 4,
        dtype=jnp.float32,
    )
    return jnp.broadcast_to(
        per_speed[:, None, None], (9, params.ny + 2 * K, params.nx)
    )


def multi_step_padded(
    f_pad: jax.Array,
    obst_pad_f32: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
    inplace: bool = False,
    trapezoid: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance K=8 timesteps on a wrap-padded state; returns
    (f_pad_next, av_8).  The scan-ready form: padding in == padding out.
    With ``inplace`` the result aliases (consumes) ``f_pad`` — ONE HBM
    state buffer total, which is what lets 16384²+ run on a single chip
    and lets XLA update a scan carry with zero copies."""
    _, nyp, nx = f_pad.shape
    ny = nyp - 2 * K
    ty = _pick_tile_rows(ny, nx)
    if ty is None or nx % _LANE:
        raise ValueError(
            f"grid {ny}x{nx} not tileable for the streaming kernel"
        )
    call = _build_call(params, ny, nx, ty, interpret, inplace, trapezoid)
    f_next, tots = call(f_pad, obst_pad_f32)
    return f_next, jnp.sum(tots, axis=0) / n_fluid


def window_supported(ly: int, nx: int) -> bool:
    """Structural tileability of a (9, ly+2K, nx) shard window (platform
    left to the caller: interpret mode runs anywhere)."""
    return (
        nx % _LANE == 0
        and ly % 8 == 0
        and ly >= K
        and _pick_tile_rows(ly, nx) is not None
    )


def window_ca_steps(
    window: jax.Array,
    masks_enc_ext: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance a ±K ghost-extended shard window K=8 steps — the multi-chip
    composition of the single-chip record kernel (parallel/halo.py
    kernel="stream"): the ghost rows hold ring-neighbor data instead of
    periodic wrap images, everything else (tiling, DMA schedule, lean
    trapezoid step) is byte-identical to the single-chip form, so a
    two-chip mesh can run grids whose single-chip form already needs the
    streaming tier.

    Args:
      window: (9, ly+2K, nx) — own rows [K, K+ly) plus K neighbor rows
        each side (assembled by ring ppermute, halo._extend_rows).
      masks_enc_ext: (ly+2K, nx) f32 encoded mask plane (encode_masks,
        same ±K ring extension; loop-invariant — build once per run).
      params: static run parameters.

    Returns (f_own (9, ly, nx), tots (K,)) — per-step ||u|| partial sums
    over the shard's own fluid cells (psum and divide outside).  The
    kernel's trailing pad-maintenance writes land in the output's ghost
    rows, which the next exchange rebuilds — own rows are unaffected.
    """
    _, r, nx = window.shape
    ly = r - 2 * K
    if not window_supported(ly, nx):
        raise ValueError(
            f"shard slab {ly}x{nx} not tileable for the streaming window "
            "kernel (lane-aligned nx, 8-multiple ly required)"
        )
    ty = _pick_tile_rows(ly, nx)
    call = _build_call(params, ly, nx, ty, interpret, False)
    out_pad, tots = call(window, masks_enc_ext)
    return unpad_state(out_pad), jnp.sum(tots, axis=0)


# x-ghost width for 2-D-torus shard windows (window_ca_steps_2d).  Must be
# >= K (in-kernel x rolls wrap at the WINDOW width, so edge garbage grows
# one column per step and reaches depth K-1 by the last step) and keep the
# window lane-aligned: lx % 128 == 0  =>  lx + 2*64 % 128 == 0.  64 is the
# smallest such value; the extra wire bytes (64 vs 8 columns per exchange)
# are row-slab-sized and amortized over K=8 steps.
X_GHOST = 64


def window_supported_2d(ly: int, lx: int) -> bool:
    """Structural tileability of a 2-D-torus shard window: the (ly, lx)
    own block extended by ±K ghost rows and ±X_GHOST ghost columns."""
    return lx % _LANE == 0 and window_supported(ly, lx + 2 * X_GHOST)


def mark_reduction_excluded(enc: jax.Array, excl: jax.Array) -> jax.Array:
    """Set the +4 reduction-exclude flag of an encoded mask plane (the
    kernel keeps the cells' true dynamics — obstacle/forcing low bits —
    but drops them from the per-step ||u|| partial sums)."""
    return enc + 4.0 * excl.astype(enc.dtype)


def window_ca_steps_2d(
    window: jax.Array,
    masks_enc_ext: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance a ±K-row/±X_GHOST-column ghost-extended 2-D-torus shard
    block K=8 steps — the x-sharded composition of :func:`window_ca_steps`
    that lifts the wide-grid ceiling (a full-nx row slab caps nx at ~33k,
    VERDICT round-4 missing #3; SURVEY §5 "x-axis ... sharded too, with
    column halos").

    The kernel body is unchanged: its in-window x rolls wrap at the
    window width, so the wrap seam's garbage grows inward one column per
    step from each window EDGE — after K steps it reaches depth K-1 < 64,
    never touching the own columns [X_GHOST, X_GHOST+lx).  The ghost
    columns carry the x-neighbor's true mask bits (correct inflow
    dynamics for the early steps) plus the +4 reduction-exclude flag so
    their — neighbor-owned, eventually-garbage — cells never enter this
    shard's ||u|| partial sums.

    Args:
      window: (9, ly+2K, lx+2*X_GHOST) — own block plus ring-exchanged
        ghost rows THEN ghost columns of the row-extended array (the
        corner-carrying two-phase order, parallel/halo.py).
      masks_enc_ext: same-extended encoded mask plane with the ghost
        columns +4-flagged (mark_reduction_excluded); loop-invariant.

    Returns (f_own (9, ly, lx), tots (K,)) per-step ||u|| partial sums
    over the shard's own fluid cells.
    """
    _, r, wnx = window.shape
    ly = r - 2 * K
    lx = wnx - 2 * X_GHOST
    if not window_supported_2d(ly, lx):
        raise ValueError(
            f"shard block {ly}x{lx} not tileable for the 2-D streaming "
            "window kernel (lane-aligned lx, 8-multiple ly required)"
        )
    ty = _pick_tile_rows(ly, wnx)
    call = _build_call(params, ly, wnx, ty, interpret, False)
    out_pad, tots = call(window, masks_enc_ext)
    return (
        out_pad[:, K : K + ly, X_GHOST : X_GHOST + lx],
        jnp.sum(tots, axis=0),
    )


# ---------------------------------------------------------------------------
# Arbitrary-shape decks (VERDICT round-4 missing #2 / next-round item 4).
#
# Every Mosaic tier needs nx % 128 == 0 and ny % 8 == 0; the reference's C
# loops are shape-agnostic (d2q9-bgk.c:2736-2747 reads two ints, every loop
# is generic), so a 1000x1000 user deck used to drop silently to the jnp
# `fused` path at a fraction of the throughput.  This tier runs ANY
# (ny, nx) >= the minimum window geometry through the unchanged streaming
# kernel by embedding the true grid in a ghost-padded window:
#
#   rows:  ly = roundup(ny, 8); the p = ly - ny pad rows sit at the bottom
#          of the own region carrying IMAGES of true rows [0, p) — with the
#          bottom ghost carrying rows [p, p+K), every pad row's neighbor
#          structure is exactly its image row's, so pad rows evolve as
#          exact copies (never garbage) and the usual ±K-ghost window
#          argument covers the whole own region.
#   cols:  wnx = roundup(nx + 2K, 128); left ghost gl = K columns of true
#          wrap data, right ghost gr = wnx - nx - K >= K columns starting
#          with true wrap data.  The kernel's in-window x-roll wraps at
#          wnx, so edge garbage grows one column per step and reaches
#          depth K-1 < gl (and < gr) after the K steps of a pass — the
#          own columns [gl, gl+nx) stay exact (the same containment proof
#          as window_ca_steps_2d's X_GHOST).
#
# Pad rows and ghost columns ride the +4 reduction-exclude mask flag, so
# the per-step ||u|| sums count true fluid cells exactly once.  Between
# passes the ghosts are REBUILT from the just-computed exact own region by
# small in-place updates (rows: 2K+p full-width rows; cols: gl+gr full-
# height columns) instead of reassembling the window — the scan carry
# stays at the window shape and HBM traffic stays ~2 state accesses per
# pass like the aligned tier.
# ---------------------------------------------------------------------------


def any_geometry(ny: int, nx: int) -> tuple[int, int, int, int, int]:
    """(ly, p, wnx, gl, gr) of the ghost-padded window embedding an
    arbitrary (ny, nx) grid (see module comment above)."""
    ly = -(-ny // 8) * 8
    p = ly - ny
    wnx = -(-(nx + 2 * K) // _LANE) * _LANE
    gl = K
    gr = wnx - nx - gl
    return ly, p, wnx, gl, gr


def window_supported_any(ny: int, nx: int) -> bool:
    """Platform-free geometry gate for the arbitrary-shape tier: the wrap
    slices must fit inside one period (ny >= p+K rows, nx >= gr columns)
    and the padded window must tile."""
    ly, p, wnx, gl, gr = any_geometry(ny, nx)
    return ny >= p + K and ny >= 2 * K and nx >= gr and window_supported(ly, wnx)


def supported_any(ny: int, nx: int) -> bool:
    """TPU-platform + geometry gate (mirrors :func:`supported`)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return on_tpu and window_supported_any(ny, nx)


def any_tier_bytes(ny: int, nx: int) -> int:
    """Device HBM the arbitrary-shape runner needs: two ping-pong window
    buffers + the f32 mask window + the unpadded f0/result."""
    ly, _, wnx, _, _ = any_geometry(ny, nx)
    t = ly + 2 * K
    return 2 * 9 * t * wnx * 4 + t * wnx * 4 + 9 * ny * nx * 4


def _extend_any(x: jax.Array, ny: int, nx: int, row_axis: int):
    """Embed a true-grid array in the ghost-padded window: wrap rows
    (top ghost K = true rows [ny-K, ny); bottom ghost+pad p+K = true rows
    [0, p+K)) then wrap columns of the row-extended array (the corner-
    carrying order, same as the two-phase torus exchange)."""
    ly, p, wnx, gl, gr = any_geometry(ny, nx)
    del ly, wnx
    ca = row_axis + 1
    rows = jnp.concatenate(
        [
            jax.lax.slice_in_dim(x, ny - K, ny, axis=row_axis),
            x,
            jax.lax.slice_in_dim(x, 0, p + K, axis=row_axis),
        ],
        axis=row_axis,
    )
    return jnp.concatenate(
        [
            jax.lax.slice_in_dim(rows, nx - gl, nx, axis=ca),
            rows,
            jax.lax.slice_in_dim(rows, 0, gr, axis=ca),
        ],
        axis=ca,
    )


def prepare_masks_any(obstacles: jax.Array, params: LBMParams) -> jax.Array:
    """Ghost-extended encoded mask window (loop-invariant): true-grid
    encode (+1 obstacle, +2 forcing row ny-2), wrap-extended like the
    state so ghost cells keep TRUE dynamics, then everything outside the
    true own region +4-flagged out of the ||u|| reduction (pad-row images
    and ghost columns are already-counted cells)."""
    ny, nx = params.ny, params.nx
    ly, p, wnx, gl, gr = any_geometry(ny, nx)
    del p, gr
    accel_rows = jnp.zeros(ny, bool).at[ny - 2].set(True)
    enc = encode_masks(obstacles, accel_rows)
    enc_ext = _extend_any(enc, ny, nx, row_axis=0)
    rows_w = jnp.arange(ly + 2 * K)[:, None]
    cols_w = jnp.arange(wnx)[None, :]
    excl = (
        (rows_w < K)
        | (rows_w >= K + ny)
        | (cols_w < gl)
        | (cols_w >= gl + nx)
    )
    return mark_reduction_excluded(enc_ext, excl)


def _rebuild_ghosts_any(out: jax.Array, ny: int, nx: int) -> jax.Array:
    """Overwrite a pass output's ghost regions from its exact own region,
    making it a valid next-pass window: rows first (full width — their
    own-column range is exact), then columns for ALL rows (sources lie in
    the true column range, already rewritten row-wise)."""
    _, p, wnx, gl, gr = any_geometry(ny, nx)
    del wnx
    out = out.at[:, 0:K, :].set(
        jax.lax.slice_in_dim(out, ny, ny + K, axis=1)
    )
    out = out.at[:, K + ny : K + ny + p + K, :].set(
        jax.lax.slice_in_dim(out, K, K + p + K, axis=1)
    )
    out = out.at[:, :, 0:gl].set(
        jax.lax.slice_in_dim(out, nx, nx + gl, axis=2)
    )
    out = out.at[:, :, gl + nx : gl + nx + gr].set(
        jax.lax.slice_in_dim(out, gl, gl + gr, axis=2)
    )
    return out


def ca_steps_any(
    window: jax.Array,
    masks_enc_ext: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance the ghost-padded window of an arbitrary-shape grid K=8
    steps and rebuild its ghosts: (window', tots (K,)) with window' a
    valid next-pass window whose own region is the exact advanced state."""
    ny, nx = params.ny, params.nx
    ly, p, wnx, gl, gr = any_geometry(ny, nx)
    del p, gl, gr
    if not window_supported_any(ny, nx):
        raise ValueError(
            f"grid {ny}x{nx} below the arbitrary-shape window tier's "
            f"minimum geometry (ny >= 16, nx >= {_LANE - 2 * K} required)"
        )
    ty = _pick_tile_rows(ly, wnx)
    call = _build_call(params, ly, wnx, ty, interpret, False)
    out_pad, tots = call(window, masks_enc_ext)
    return _rebuild_ghosts_any(out_pad, ny, nx), jnp.sum(tots, axis=0)


def run_any(
    f0: jax.Array,
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Full loop for arbitrary (non-lane-aligned) grids: the true grid is
    embedded ONCE in the ghost-padded window, scanned at K=8 steps per
    streamed pass (two kernel calls per scan body — the copy-free carry
    pattern, ops.fused.run_simulation), and the exact own region sliced
    out at the end; a sub-K tail runs the jnp fused step on the true
    grid.  Drop-in for ops.fused.run_simulation; wrap in jax.jit.
    Reference parity: d2q9-bgk.c:2736-2747 (shape-agnostic loader) —
    the tier that keeps odd user decks off the slow path."""
    from advanced_hpc_lbm_tpu.ops import fused

    ny, nx = params.ny, params.nx
    iters = params.max_iters if n_iters is None else n_iters
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)
    enc_ext = prepare_masks_any(obstacles, params)
    ly, p, wnx, gl, gr = any_geometry(ny, nx)
    del ly, p, wnx, gr

    def one(w):
        w2, tots = ca_steps_any(w, enc_ext, params, interpret=interpret)
        return w2, tots / n_fluid

    w = _extend_any(f0, ny, nx, row_axis=1)
    done = iters - iters % K
    av = jnp.zeros((0,), jnp.float32)
    if done:
        def body(w_c, _):
            w1, av1 = one(w_c)
            w2, av2 = one(w1)
            return w2, jnp.concatenate([av1, av2])

        w, av_chunks = jax.lax.scan(body, w, None, length=done // (2 * K))
        av = av_chunks.reshape(-1)
        if done % (2 * K):
            w, av_mid = one(w)
            av = jnp.concatenate([av, av_mid])
    f = w[:, K : K + ny, gl : gl + nx]
    if iters - done:
        obst = (obstacles != 0)
        for _ in range(iters - done):
            f, av_last = fused.fused_step(f, obst, n_fluid, params)
            av = jnp.concatenate([av, av_last[None]])
    return f, av


def multi_step(
    f: jax.Array,
    obstacles_f32_pad: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance K=8 timesteps from an unpadded state (pads/unpads around
    one kernel pass — convenience/testing form; loops should scan
    multi_step_padded)."""
    if obstacles_f32_pad.shape[0] == f.shape[1]:
        obstacles_f32_pad = prepare_obstacles(obstacles_f32_pad != 0.0)
    f_pad, av = multi_step_padded(
        pad_state(f), obstacles_f32_pad, n_fluid, params, interpret=interpret
    )
    return unpad_state(f_pad), av


def run_padded(
    f_pad: jax.Array,
    obst_pad: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    *,
    n_iters: int,
    interpret: bool = False,
    inplace: bool = False,
    trapezoid: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The K-multiple part of the loop on an ALREADY-padded state:
    ``n_iters`` must be a multiple of K.  Split out so huge grids can
    donate the padded carry into a jit that holds only the two ping-pong
    buffers — the single-jit :func:`run` peaks at unpadded-input + two
    padded buffers, which at 12288² is 160 MB over the chip's 15.75 GB
    HBM (measured compile OOM, round 3).  ``inplace`` scans the aliased
    one-buffer kernel instead: the carry is updated literally in place,
    so there is no hidden scan-carry copy to dodge and one call per
    body suffices."""
    assert n_iters % K == 0
    def one(f_p):
        return multi_step_padded(
            f_p, obst_pad, n_fluid, params, interpret=interpret,
            inplace=inplace, trapezoid=trapezoid,
        )

    if inplace:
        f_pad, av_chunks = jax.lax.scan(
            lambda f_p, _: one(f_p), f_pad, None, length=n_iters // K
        )
        return f_pad, av_chunks.reshape(-1)

    # two kernel calls per scan iteration: with one opaque call per body
    # XLA copies the full state to update the carry in place (see
    # ops.fused.run_simulation / BENCH.md "hidden scan-carry copy")
    def body(f_p, _):
        f1, av1 = one(f_p)
        f2, av2 = one(f1)
        return f2, jnp.concatenate([av1, av2])

    f_pad, av_chunks = jax.lax.scan(
        body, f_pad, None, length=n_iters // (2 * K)
    )
    av = av_chunks.reshape(-1)
    if n_iters % (2 * K):
        f_pad, av_mid = one(f_pad)
        av = jnp.concatenate([av, av_mid])
    return f_pad, av


def run(
    f0: jax.Array,
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int | None = None,
    interpret: bool = False,
    inplace: bool = False,
    trapezoid: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Full loop at K=8 steps per streamed pass (tail via the 1-step
    kernel).  Drop-in for ops.fused.run_simulation; wrap in jax.jit.
    The state is padded ONCE, scanned in padded form (the kernel
    maintains the wrap rows), and unpadded at the end.  ``inplace``
    holds ONE padded state buffer through the scan (aliased kernel) —
    the mode for grids whose state is a large fraction of HBM (12288²
    measured 15.86 GLUPS; for 16384²+ skip this wrapper's unpadded
    input/output entirely: :func:`initial_state_padded` +
    :func:`run_padded` + plane-wise fetch, see
    scripts/stream_inplace_probe.py)."""
    iters = params.max_iters if n_iters is None else n_iters
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)
    obst_pad = prepare_obstacles(obstacles)

    f_pad = pad_state(f0)
    done = iters - iters % K
    av = jnp.zeros((0,), jnp.float32)
    if done:
        f_pad, av = run_padded(
            f_pad, obst_pad, n_fluid, params, n_iters=done,
            interpret=interpret, inplace=inplace, trapezoid=trapezoid,
        )
    f = unpad_state(f_pad)
    if iters - done:
        obst8 = pallas_step.prepare_obstacles(obstacles)
        for _ in range(iters - done):
            f, av_last = pallas_step.pallas_fused_step(
                f, obst8, n_fluid, params, interpret=interpret
            )
            av = jnp.concatenate([av, av_last[None]])
    return f, av


def use_trapezoid(ny: int, nx: int) -> bool:
    """Default step form — MEASURED CLOSED at False (2026-08-18,
    scripts/stream_trapezoid{,_padded}_probe.py, interleaved): the
    static-slice trapezoid loses 3% at ty=64/8192² (16.46 vs 15.98
    GLUPS — its unaligned sublane loads cost ~16% per row, more than the
    11% row savings) and is a dead heat at ty=24/18432² (13.30 vs 13.29,
    rounds alternate winners) where the row savings reach 22.5% — i.e.
    at small tiles the kernel is NOT bound by the seam row recompute at
    all.  The variant is kept as a bitwise-tested differential oracle
    (tests/test_stream.py), not a production path."""
    del ny, nx
    return False


def padded_tier_bytes(ny: int, nx: int) -> int:
    """Device HBM the padded-native runner needs: the single wrap-padded
    state buffer + the f32 mask plane (plane-wise fetch adds one
    (ny, nx) f32 plane transiently)."""
    return 9 * (ny + 2 * K) * nx * 4 + (ny + 2 * K) * nx * 4 + ny * nx * 4


def make_padded_runner(
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int,
    interpret: bool = False,
    trapezoid: bool | None = None,
):
    """Whole-run runner for grids where even the UNPADDED state cannot
    sit beside the padded carry (16384²+ on a 16 GiB chip): equilibrium
    is built directly at the padded shape on device, the whole loop runs
    as ONE donated in-place scan jit, and the result is fetched to HOST
    plane-by-plane — the full (9, ny, nx) state never exists on device.
    Measured: 16384² at 14.77 GLUPS (9.01 GiB buffer), 18432² at 13.22
    (11.40 GiB) — BENCH.md "The in-place kernel".

    Returns ``runner(f_init=None) -> (f_host, av_host)`` with ``f_host``
    a host numpy array; ``runner.warmup()`` AOT-compiles both phases
    without executing a step.  ``f_init`` is an optional HOST (9, ny, nx)
    fp32 array to start from instead of equilibrium (checkpoint resume,
    VERDICT round-3 item 2): it is wrap-padded on the HOST and
    device_put at the padded shape, so the device still never holds the
    unpadded state beside the padded buffer."""
    if n_iters % K:
        raise ValueError(
            f"the padded-native single-buffer tier runs K={K} steps per "
            f"pass and needs n_iters % {K} == 0 (got {n_iters}); the "
            "1-step tail kernel would need the unpadded state on device, "
            "which this grid size cannot hold next to the padded buffer"
        )
    ny, nx = params.ny, params.nx
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)
    obst_pad = prepare_obstacles(obstacles)

    fp_s = jax.ShapeDtypeStruct((9, ny + 2 * K, nx), jnp.float32)
    op_s = jax.ShapeDtypeStruct(obst_pad.shape, obst_pad.dtype)
    nf_s = jax.ShapeDtypeStruct((), jnp.float32)

    if trapezoid is None:
        trapezoid = use_trapezoid(ny, nx)

    def scan_fn(fp, op, nf):
        return run_padded(
            fp, op, nf, params, n_iters=n_iters, interpret=interpret,
            inplace=True, trapezoid=trapezoid,
        )

    # explicit AOT executables (jit's dispatch cache is not seeded by
    # .lower().compile(), see make_split_runner's history in BENCH.md)
    exes: dict[str, object] = {}

    def _exe(name, fn, *shapes, donate=True):
        if name not in exes:
            kw = {"donate_argnums": 0} if donate else {}
            exes[name] = jax.jit(fn, **kw).lower(*shapes).compile()
        return exes[name]

    def warmup():
        _exe("init", initial_state_padded_fn, donate=False)
        _exe("scan", scan_fn, fp_s, op_s, nf_s)

    def initial_state_padded_fn():
        return initial_state_padded(params)

    def runner(f_init: np.ndarray | None = None):
        if f_init is None:
            fp = _exe("init", initial_state_padded_fn, donate=False)()
        else:
            if f_init.shape != (9, ny, nx):
                raise ValueError(
                    f"initial state {f_init.shape} != (9, {ny}, {nx})"
                )
            # pad on HOST, then ship the padded buffer in one device_put:
            # jnp-side pad_state would hold unpadded + padded on device
            # (the exact footprint this tier exists to avoid)
            f_init = np.asarray(f_init, np.float32)
            fp_host = np.empty((9, ny + 2 * K, nx), np.float32)
            fp_host[:, K : K + ny, :] = f_init
            fp_host[:, :K, :] = f_init[:, -K:, :]
            fp_host[:, K + ny :, :] = f_init[:, :K, :]
            fp = jax.device_put(fp_host)
        # real sync (block_until_ready is unreliable through the relay,
        # CLAUDE.md) + absorbs the process's first device->host cost
        np.asarray(fp[0, 0, :_LANE])
        fp, av = _exe("scan", scan_fn, fp_s, op_s, nf_s)(
            fp, obst_pad, n_fluid
        )
        av_h = np.asarray(av)
        f_host = np.empty((9, ny, nx), np.float32)
        for c in range(9):  # plane-wise: never unpads on device
            f_host[c] = np.asarray(fp[c, K : K + ny, :])
        return f_host, av_h

    runner.warmup = warmup
    return runner
