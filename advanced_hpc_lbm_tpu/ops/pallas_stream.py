"""HBM-streaming K-step kernel: manual DMA pipeline, minimal VMEM.

The auto-pipelined K-step kernel (ops.pallas_k) spends most of its VMEM on
Mosaic's double-buffered operand/output blocks (4 x 36*ty*nx) ON TOP of the
two lean ping-pong windows the trapezoid actually computes in — which caps
ty (the seam-recompute divisor, 2K/ty) well below what the chip could hold.
This kernel drops the pipelined blocks entirely: the full distribution
arrays stay in HBM (``pl.ANY``), and each grid step DMAs its ±K ghost
window straight into one of two VMEM window buffers (double-buffered across
tiles by hand), runs K liveness-lean steps ping-ponging against a shared
scratch window, and DMAs its own rows straight back out.  VMEM per tile is
3 windows + 2 mask windows ≈ (116 B)*(ty+2K)*nx — HALF of pallas_k's
budget — so ty=128 fits at 4096^2 (seam 12.5% at K=8) and ty=64 at 8192^2,
and grids whose two HBM buffers barely fit the chip (12288^2) can run at
all: the kernel itself adds only ~70 MB of VMEM and zero XLA transients.

K is fixed at 8: with ty % 8 == 0 every ingress/egress row offset
(i*ty ± 8 mod ny) lands on the fp32 tile granule, which Mosaic's DMA
engine requires (CLAUDE.md: no sub-granule row slices of tiled fp32).

Pipeline (grid steps are sequential on the core; only DMAs overlap):

  tile i:  wait ingress(i)          [started at tile i-1]
           wait egress(i-1)         [its window buffer is reused next]
           start ingress(i+1)       [into the other window buffer]
           K lean steps             [window <-> shared scratch, K even:
                                     the state ends back in the window]
           start egress(i)          [own rows straight from the window]

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
    windows fit the budget.  Bigger ty => smaller seam recompute 2K/ty."""
    override = os.environ.get("LBM_STREAM_TY")
    if override:
        ty = int(override)
        return ty if ny % ty == 0 and ty % 8 == 0 else None
    for ty in (256, 192, 128, 96, 64, 48, 32, 24, 16):
        if ny % ty:
            continue
        t = ty + 2 * K
        need = (3 * 9 * 4 + 2 * 4) * t * nx  # 116 B per window row
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
    f_any, om_any, out_any, tot_ref,
    p0, p1, d_scr, m0, m1,
    sem_f0, sem_f1, sem_m0, sem_m1, sem_o0, sem_o1,
    *, params: LBMParams, ty: int, ny: int, nx: int,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    zero = jnp.float32(0.0)
    T = ty + 2 * K

    def ingress_copies(j, pbuf, mbuf, sf, sm):
        """The 5 DMAs that assemble tile j's ±K window: top K rows, main
        ty rows, bottom K rows of f (each contiguous mod ny) + the mask
        window in 2 chunks (mask rows [top, top+T) can wrap at most once;
        split mirrors the f chunks).  Descriptors are pure functions of j
        so the waiter can reconstruct them."""
        base = j * ty
        top = (base - K) % ny
        bot = (base + ty) % ny
        return [
            pltpu.make_async_copy(
                f_any.at[:, pl.ds(top, K), :], pbuf.at[:, 0:K, :], sf
            ),
            pltpu.make_async_copy(
                f_any.at[:, pl.ds(base, ty), :], pbuf.at[:, K : K + ty, :], sf
            ),
            pltpu.make_async_copy(
                f_any.at[:, pl.ds(bot, K), :], pbuf.at[:, K + ty : T, :], sf
            ),
            pltpu.make_async_copy(
                om_any.at[pl.ds(top, K), :], mbuf.at[0:K, :], sm
            ),
            pltpu.make_async_copy(
                om_any.at[pl.ds(base, ty), :], mbuf.at[K : K + ty, :], sm
            ),
            pltpu.make_async_copy(
                om_any.at[pl.ds(bot, K), :], mbuf.at[K + ty : T, :], sm
            ),
        ]

    def egress_copy(j, pbuf, so):
        return pltpu.make_async_copy(
            pbuf.at[:, K : K + ty, :],
            out_any.at[:, pl.ds(j * ty, ty), :],
            so,
        )

    def tile_body(pbuf, mbuf, sf, sm, so, so_other, pother, mother, sf_o, sm_o):
        """One tile on a statically-chosen window buffer pair."""
        # my ingress was started by tile i-1 (or just now for i == 0)
        for cp in ingress_copies(i, pbuf, mbuf, sf, sm):
            cp.wait()

        # the OTHER buffer: tile i-1 computed in it and its egress may
        # still be in flight; drain before overwriting with ingress(i+1)
        @pl.when(i >= 1)
        def _drain_prev_egress():
            egress_copy(i - 1, pother, so_other).wait()

        @pl.when(i + 1 < n)
        def _prefetch_next():
            for cp in ingress_copies(i + 1, pother, mother, sf_o, sm_o):
                cp.start()

        w_obst = mbuf[...] != 0.0
        obst_main = mbuf[K : K + ty, :] != 0.0
        accel_T = (
            (jax.lax.broadcasted_iota(jnp.int32, (T, nx), 0) + i * ty - K)
            % ny
        ) == (ny - 2)

        src, dst = pbuf, d_scr
        for s in range(K):
            u_sq = kernel_common.lean_window_step(
                src, dst, w_obst, accel_T, params, T, nx
            )
            norm = jnp.sqrt(jax.lax.slice_in_dim(u_sq, K, K + ty, axis=0))
            tot_ref[i, s] = jnp.sum(jnp.where(obst_main, zero, norm))
            src, dst = dst, src
        # K even: the final state sits back in pbuf (src after the swap)

        egress_copy(i, pbuf, so).start()

        @pl.when(i == n - 1)
        def _drain_last():
            egress_copy(i, pbuf, so).wait()

    @pl.when(i == 0)
    def _first_ingress():
        for cp in ingress_copies(0, p0, m0, sem_f0, sem_m0):
            cp.start()

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
def _build_call(params: LBMParams, ny: int, nx: int, ty: int, interpret: bool):
    T = ty + 2 * K
    kernel = functools.partial(
        _kernel, params=params, ty=ty, ny=ny, nx=nx
    )
    return pl.pallas_call(
        kernel,
        grid=(ny // ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # f (full, HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # obstacle mask f32 (full)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # f_next (full, HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ny // ty, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, T, nx), jnp.float32),  # window A
            pltpu.VMEM((9, T, nx), jnp.float32),  # window B
            pltpu.VMEM((9, T, nx), jnp.float32),  # shared step scratch
            pltpu.VMEM((T, nx), jnp.float32),  # mask window A
            pltpu.VMEM((T, nx), jnp.float32),  # mask window B
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


def prepare_obstacles(obstacles: jax.Array) -> jax.Array:
    return obstacles.astype(jnp.float32)


def multi_step(
    f: jax.Array,
    obstacles_f32: jax.Array,
    n_fluid: jax.Array,
    params: LBMParams,
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Advance K=8 timesteps in one streamed pass; returns (f_next, av_8)."""
    _, ny, nx = f.shape
    ty = _pick_tile_rows(ny, nx)
    if ty is None or nx % _LANE:
        raise ValueError(
            f"grid {ny}x{nx} not tileable for the streaming kernel"
        )
    if obstacles_f32.dtype != jnp.float32:
        obstacles_f32 = prepare_obstacles(obstacles_f32)
    call = _build_call(params, ny, nx, ty, interpret)
    f_next, tots = call(f, obstacles_f32)
    return f_next, jnp.sum(tots, axis=0) / n_fluid


def run(
    f0: jax.Array,
    obstacles: jax.Array,
    params: LBMParams,
    *,
    n_iters: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Full loop at K=8 steps per streamed pass (tail via the 1-step
    kernel).  Drop-in for ops.fused.run_simulation; wrap in jax.jit."""
    iters = params.max_iters if n_iters is None else n_iters
    n_fluid = jnp.sum(obstacles == 0).astype(jnp.float32)
    obst_f = prepare_obstacles(obstacles)

    def one(f):
        return multi_step(f, obst_f, n_fluid, params, interpret=interpret)

    # two kernel calls per scan iteration: with one opaque call per body
    # XLA copies the full state to update the carry in place (see
    # ops.fused.run_simulation / BENCH.md "hidden scan-carry copy")
    def body(f, _):
        f1, av1 = one(f)
        f2, av2 = one(f1)
        return f2, jnp.concatenate([av1, av2])

    f, av_chunks = jax.lax.scan(body, f0, None, length=iters // (2 * K))
    av = av_chunks.reshape(-1)
    done = (iters // (2 * K)) * 2 * K
    if iters - done >= K:
        f, av_mid = one(f)
        av = jnp.concatenate([av, av_mid])
        done += K
    if iters - done:
        obst8 = pallas_step.prepare_obstacles(obstacles)
        for _ in range(iters - done):
            f, av_last = pallas_step.pallas_fused_step(
                f, obst8, n_fluid, params, interpret=interpret
            )
            av = jnp.concatenate([av, av_last[None]])
    return f, av
