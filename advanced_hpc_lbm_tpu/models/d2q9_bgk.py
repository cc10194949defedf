"""The D2Q9-BGK simulation model: state + end-to-end run.

This is the "model family" of the framework — the layer a user touches.  It
owns deck loading, backend selection (fused jnp / Pallas / sharded), the
on-device main loop, diagnostics (Reynolds number, d2q9-bgk.c:2893-2898),
and output writing.  The reference equivalent is ``main``
(d2q9-bgk.c:146-226) minus the argv/timing scaffolding, which lives in
:mod:`advanced_hpc_lbm_tpu.cli`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from advanced_hpc_lbm_tpu.ops import fused, reference
from advanced_hpc_lbm_tpu.params import LBMParams
from advanced_hpc_lbm_tpu.utils import io as lbm_io

Backend = Literal[
    "auto", "fused", "pallas", "pallas2", "pallask", "resident", "stream",
    "sharded", "pipeline",
]


def _to_host(x) -> np.ndarray:
    """Host materialization that also works on a multi-host launch: a
    global array some of whose shards live on other hosts' devices cannot
    be device_get directly — every process allgathers it instead
    (parallel/multihost.py; single-process arrays take the direct path)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


@dataclasses.dataclass
class SimulationResult:
    """Host-side results of one run."""

    params: LBMParams
    f_final: np.ndarray  # (9, ny, nx) fp32
    av_vels: np.ndarray  # (max_iters,) fp32
    densities: np.ndarray | None = None  # per-step total density (debug mode)

    @property
    def reynolds(self) -> float:
        """av_velocity(final state) * reynolds_dim / viscosity
        (calc_reynolds, d2q9-bgk.c:2893-2898).  Computed host-side from the
        final state, like the reference does at exit (d2q9-bgk.c:217)."""
        f = self.f_final.astype(np.float32)
        rho = f.sum(axis=0)
        u_x = (f[1] + f[5] + f[8] - (f[3] + f[6] + f[7])) / rho
        u_y = (f[2] + f[5] + f[6] - (f[4] + f[7] + f[8])) / rho
        fluid = ~self._obstacles_cache
        norm = np.sqrt(u_x * u_x + u_y * u_y, dtype=np.float32)
        av = np.float32(norm[fluid].sum(dtype=np.float32)) / np.float32(
            fluid.sum()
        )
        return float(av * np.float32(self.params.reynolds_dim) / np.float32(
            self.params.viscosity
        ))

    # filled in by Simulation.run; kept out of the dataclass signature
    _obstacles_cache: np.ndarray = dataclasses.field(
        default=None, repr=False, compare=False
    )
    # set by run(fetch=False, check_finite=True): the finiteness gate is
    # deferred to collate() because the arrays are still on device
    _check_finite_pending: bool = dataclasses.field(
        default=False, repr=False, compare=False
    )

    def write(
        self,
        out_dir: str | os.PathLike = ".",
        *,
        final_state_name: str = lbm_io.FINAL_STATE_FILE,
        av_vels_name: str = lbm_io.AV_VELS_FILE,
    ) -> tuple[str, str]:
        """Write final_state.dat + av_vels.dat (write_values,
        d2q9-bgk.c:2918-2999)."""
        fs = os.path.join(out_dir, final_state_name)
        av = os.path.join(out_dir, av_vels_name)
        lbm_io.write_final_state(fs, self.f_final, self._obstacles_cache, self.params)
        lbm_io.write_av_vels(av, self.av_vels)
        return fs, av

    def collate(self) -> "SimulationResult":
        """Materialize device results to host — the reference's Collate
        phase (d2q9-bgk.c:203-213; the MPI stub at :208).  On TPU the
        device->host transfer IS the collation, and it is NOT part of
        compute: ``Simulation.run(fetch=False)`` leaves results on device
        so the CLI can time this separately, like the reference's timer
        split.  Idempotent; applies a deferred ``check_finite``."""
        self.f_final = _to_host(self.f_final)
        self.av_vels = _to_host(self.av_vels)
        if self.densities is not None:
            self.densities = _to_host(self.densities)
        if self._check_finite_pending:
            self._check_finite_pending = False
            Simulation._assert_finite(self)
        return self


# Per-chip HBM by device generation, for TPUs whose runtime doesn't expose
# memory_stats (ordered: first substring match of device_kind wins, so the
# "lite" variants come before their bare-version prefixes).
_HBM_BY_KIND: tuple[tuple[str, int], ...] = (
    ("v6 lite", 32 * 1024**3), ("v6e", 32 * 1024**3),
    ("v5 lite", 16 * 1024**3), ("v5e", 16 * 1024**3),
    ("v5p", 95 * 1024**3), ("v5", 95 * 1024**3),
    ("v4", 32 * 1024**3),
    # v2/v3 are exposed by jax as per-CORE devices (two cores share a chip),
    # so the per-device capacity is half the chip's 16/32 GiB.
    ("v3", 16 * 1024**3),
    ("v2", 8 * 1024**3),
)


def _device_hbm_bytes() -> int | None:
    """This chip's HBM capacity, or None when the footprint gate doesn't
    apply (CPU/GPU hosts page; only the TPU's fixed HBM hard-fails).
    A TPU whose runtime lacks memory_stats falls back to a device_kind
    table with a warning; an unrecognized TPU assumes the smallest chip
    (16 GiB) so the fit gates stay conservative.  Any failure to even
    enumerate devices returns None — no fixed-HBM assumption where no
    fixed HBM is known to exist (ADVICE round 3)."""
    try:
        d = jax.devices()[0]
    except Exception:
        return None
    if d.platform != "tpu":
        return None
    try:
        stats = d.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    import warnings

    kind = (getattr(d, "device_kind", "") or "").lower()
    for pat, size in _HBM_BY_KIND:
        if pat in kind:
            warnings.warn(
                f"device memory_stats unavailable; assuming "
                f"{size / 2**30:.0f} GiB HBM from device_kind "
                f"{kind!r} (models/d2q9_bgk._HBM_BY_KIND)"
            )
            return size
    warnings.warn(
        f"device memory_stats unavailable and device_kind {kind!r} "
        "unrecognized; assuming 16 GiB HBM (smallest TPU) so the "
        "HBM-fit gates stay conservative"
    )
    return 16 * 1024**3


class Simulation:
    """One configured D2Q9-BGK run: params + obstacle mask + backend."""

    def __init__(
        self,
        params: LBMParams,
        obstacles: np.ndarray,
        *,
        backend: Backend = "auto",
        precision: Literal["fp32"] = "fp32",
    ) -> None:
        if obstacles.shape != (params.ny, params.nx):
            raise ValueError(
                f"obstacle mask {obstacles.shape} != grid ({params.ny}, {params.nx})"
            )
        self.params = params
        self.obstacles = np.asarray(obstacles, dtype=bool)
        self.backend = backend
        self._step_fn = self._resolve_backend(backend)
        # (iters, debug) -> AOT-compiled whole-run executable (see warmup)
        self._compiled: dict[tuple[int, bool], object] = {}

    @classmethod
    def from_decks(
        cls,
        paramfile: str | os.PathLike,
        obstaclefile: str | os.PathLike,
        **kwargs,
    ) -> "Simulation":
        params = lbm_io.load_params(paramfile)
        obstacles = lbm_io.load_obstacles(obstaclefile, params)
        return cls(params, obstacles, **kwargs)

    def _resolve_backend(self, backend: Backend):
        if backend == "auto":
            # fastest applicable path (all measured, BENCH.md): VMEM-
            # resident whole-run kernel for small grids; K-step ghost-zone
            # kernel where the device is DMA-bound (> 1024^2 — it cuts
            # HBM traffic ~K-fold); 1-step Pallas kernel at <= 1024^2
            # (already at the traffic floor there, K > 1 just adds VPU
            # work); XLA-fused jnp otherwise
            from advanced_hpc_lbm_tpu.ops import pallas_k, pallas_step, resident

            from advanced_hpc_lbm_tpu.ops import pallas_stream

            ny, nx = self.params.ny, self.params.nx
            hbm = _device_hbm_bytes()
            state = 9 * ny * nx * 4
            # the auto-pipelined paths double-buffer + carry one XLA
            # transient (3x state); the in-place streaming kernel peaks
            # at 2x state (unpadded f0 beside the single aliased padded
            # carry) + the f32 mask plane
            pallask_fits = hbm is None or 3 * state <= 0.9 * hbm
            # the weakest stream requirement is the padded-native tier
            # (ONE padded buffer + masks); _make_device_runner picks it
            # automatically when the 2x-state jit form doesn't fit
            from advanced_hpc_lbm_tpu.ops.pallas_stream import (
                padded_tier_bytes,
            )

            stream_fits = (
                hbm is None or padded_tier_bytes(ny, nx) <= 0.9 * hbm
            )
            if resident.supported(ny, nx):
                self.backend = backend = "resident"
            elif (
                (ny * nx >= 8192 * 8192 or not pallask_fits)
                and ny * nx > 1024 * 1024
                and pallas_stream.supported(ny, nx)
                and stream_fits
            ):
                # ≥ 8192² the in-place streaming kernel is the measured
                # winner (16.46 vs pallask 15.97 GLUPS interleaved,
                # scripts/inplace8192_compare.py) at one third the HBM;
                # below that pallask's seam-light auto-pipeline wins —
                # unless its 3x-state footprint no longer fits, where
                # stream is also the fall-through instead of failing
                # loud later
                self.backend = backend = "stream"
            elif (
                ny * nx > 1024 * 1024
                and pallas_step.supported(ny, nx)
                and pallas_k.best_k(ny, nx) is not None
            ):
                self.backend = backend = "pallask"
            elif pallas_step.supported(ny, nx):
                self.backend = backend = "pallas"
            elif pallas_stream.supported_any(ny, nx) and (
                hbm is None
                or pallas_stream.any_tier_bytes(ny, nx) <= 0.9 * hbm
            ):
                # non-lane-aligned decks (the reference's loader is
                # shape-agnostic, d2q9-bgk.c:2736-2747): the ghost-padded
                # window embedding runs the streaming kernel on ANY shape
                # >= the minimum window geometry instead of silently
                # dropping ~10x to the jnp path (VERDICT round-4 item 4)
                self.backend = backend = "stream"
            else:
                self.backend = backend = "fused"
        if backend in ("resident", "pallas2", "pallask", "stream"):
            return None  # whole-run paths, resolved in run()
        if backend == "fused":
            return fused.fused_step
        if backend == "pipeline":
            def pipeline_step(f, obstacles, n_fluid, params):
                del n_fluid
                return reference.timestep_pipeline(f, obstacles, params)
            return pipeline_step
        if backend == "pallas":
            from advanced_hpc_lbm_tpu.ops.pallas_step import pallas_fused_step
            return pallas_fused_step
        if backend == "sharded":
            # resolved lazily in run(); sharded execution wraps the whole
            # scan, not the single step
            return fused.fused_step
        raise ValueError(f"unknown backend: {backend!r}")

    def initial_state(self) -> jax.Array:
        return reference.initial_state(self.params)

    def _make_device_runner(self, iters: int, debug: bool):
        """The jitted whole-run callable (f0, obstacles) -> outputs for the
        current single-device backend.  Output arity: 3 with debug (f, av,
        densities — always via the fused path), else 2 (f, av)."""
        if self.backend == "resident" and not debug:
            from advanced_hpc_lbm_tpu.ops import resident

            return jax.jit(
                lambda f, o: resident.resident_run(
                    f, o, self.params, n_iters=iters
                ),
                donate_argnums=0,
            )
        if self.backend == "pallas2" and not debug:
            from advanced_hpc_lbm_tpu.ops import pallas_multi

            return jax.jit(
                lambda f, o: pallas_multi.run(f, o, self.params, n_iters=iters),
                donate_argnums=0,
            )
        if self.backend == "stream" and not debug:
            from advanced_hpc_lbm_tpu.ops import pallas_stream

            if not pallas_stream.supported(self.params.ny, self.params.nx):
                if pallas_stream.supported_any(
                    self.params.ny, self.params.nx
                ):
                    # non-lane-aligned deck: the ghost-padded window
                    # embedding (ops.pallas_stream.run_any) — same kernel,
                    # true grid framed by wrap ghosts, exact own region
                    return jax.jit(
                        lambda f, o: pallas_stream.run_any(
                            f, o, self.params, n_iters=iters
                        ),
                        donate_argnums=0,
                    )
                raise ValueError(
                    f"grid {self.params.ny}x{self.params.nx} not tileable "
                    "for the streaming kernel (TPU, lane-aligned nx, "
                    "8-multiple ny required — nor for its arbitrary-shape "
                    "window embedding, which needs ny >= 16 / nx >= 112)"
                )
            # always the in-place (aliased, single-buffer) scan: measured
            # FASTER than the two-buffer form at 8192² (16.46 vs 16.22
            # GLUPS interleaved, scripts/inplace8192_compare.py), peak
            # HBM 2x state instead of 3x (f0 + padded carry, then carry +
            # unpadded result), and the only form that runs 12288²
            # (15.86 GLUPS, one 5.07 GiB buffer — every two-buffer
            # variant OOM'd, BENCH.md "The in-place kernel")
            state = 9 * self.params.ny * self.params.nx * 4
            hbm = _device_hbm_bytes()
            if (
                hbm is not None
                and 2 * state + self.params.ny * self.params.nx * 4
                > 0.9 * hbm
            ):
                # 16384²+: even the jit's unpadded input/result beside
                # the padded carry is too big — the padded-native tier
                # never materializes the unpadded state on device
                # (padded equilibrium init, plane-wise host fetch;
                # measured 14.77 / 13.22 GLUPS at 16384² / 18432²)
                padded = pallas_stream.make_padded_runner(
                    jnp.asarray(self.obstacles), self.params,
                    n_iters=iters,
                )

                def wrapped(f, o):
                    # three input forms (VERDICT round-3 item 2 — a
                    # resumed state must NOT restart from equilibrium):
                    #   None        -> straight run; equilibrium built
                    #                  directly at the padded shape
                    #   host numpy  -> checkpoint/resume state, threaded
                    #                  in via host-side padding (the
                    #                  device never holds unpadded +
                    #                  padded together)
                    #   device array-> only the straight-run equilibrium
                    #                  f0 ever arrives this way; it fits
                    #                  ALONE but not beside the padded
                    #                  buffer — free it and re-init at
                    #                  the padded shape (identical values)
                    if f is None:
                        return padded()
                    if isinstance(f, np.ndarray):
                        return padded(f)
                    f.delete()
                    return padded()

                wrapped.warmup = padded.warmup
                # marks this runner as consuming HOST state between
                # checkpoint segments (and needing no f0 allocation at
                # all for a straight run)
                wrapped.padded_native = True
                return wrapped
            return jax.jit(
                lambda f, o: pallas_stream.run(
                    f, o, self.params, n_iters=iters, inplace=True
                ),
                donate_argnums=0,
            )
        if self.backend == "pallask" and not debug:
            from advanced_hpc_lbm_tpu.ops import pallas_k

            k = pallas_k.best_k(self.params.ny, self.params.nx)
            if k is None:
                raise ValueError(
                    f"grid {self.params.ny}x{self.params.nx} not tileable "
                    "for the K-step kernel; use 'pallas'"
                )
            return jax.jit(
                lambda f, o: pallas_k.run(
                    f, o, self.params, n_iters=iters, k=k
                ),
                donate_argnums=0,
            )
        # debug mode needs per-step host data; whole-run kernels fall back
        step_fn = (
            fused.fused_step
            if self.backend in ("resident", "pallas2", "pallask", "stream")
            else self._step_fn
        )
        return jax.jit(
            lambda f, o: fused.run_simulation(
                f,
                o,
                self.params,
                n_iters=iters,
                step_fn=step_fn,
                collect_density=debug,
            ),
            donate_argnums=0,
        )

    def _check_single_chip_fit(self, debug: bool = False) -> None:
        """Fail loudly with an actionable message on grids whose
        double-buffered state (+XLA transients) exceeds this chip's HBM,
        instead of a raw ResourceExhausted mid-run.  Measured wall (BENCH.md
        headline note): 8192^2 (2 x 2.4 GB) runs; 12288^2 (2 x 5.4 GB +
        transients) does not.  The 3x factor models in+out scan buffers
        plus one transient copy."""
        hbm = _device_hbm_bytes()
        if hbm is None:
            return
        state = 9 * self.params.ny * self.params.nx * 4
        from advanced_hpc_lbm_tpu.ops.pallas_stream import padded_tier_bytes

        if self.backend == "stream" and not debug:
            # the weakest stream form is the padded-native single-buffer
            # tier (the runner selects it automatically when the
            # 2x-state jit form doesn't fit).  With debug the runner
            # falls back to the fused 3x-state path (per-step densities
            # need the scan), so gate on THAT requirement instead
            # (ADVICE round 3).  Non-lane-aligned decks run the
            # arbitrary-shape window embedding, whose peak is two
            # ping-pong windows instead
            from advanced_hpc_lbm_tpu.ops import pallas_stream

            if pallas_stream.supported(self.params.ny, self.params.nx):
                need = padded_tier_bytes(self.params.ny, self.params.nx)
            else:
                need = pallas_stream.any_tier_bytes(
                    self.params.ny, self.params.nx
                )
        else:
            need = 3 * state  # in+out scan buffers + one transient copy
        if need > 0.9 * hbm:
            # only suggest the streaming backend when its own peak would
            # actually fit — otherwise the user follows the hint straight
            # into a second failure
            stream_need = padded_tier_bytes(self.params.ny, self.params.nx)
            stream_helps = (
                not debug
                and self.backend != "stream"
                and stream_need <= 0.9 * hbm
            )
            # with --debug every backend falls back to the fused 3x-state
            # scan (per-step densities), so the actionable fix is dropping
            # the flag, not switching kernels
            debug_helps = debug and stream_need <= 0.9 * hbm
            label = (
                "streaming"
                if self.backend == "stream" and not debug
                else "double-buffered +transients"
            )
            raise ValueError(
                f"grid {self.params.ny}x{self.params.nx} needs "
                f"~{need / 2**30:.1f} GB of HBM ({label}), "
                f"exceeding this chip's {hbm / 2**30:.0f} GB; "
                "shard it over a device mesh with --devices N or "
                "--mesh MYxMX (parallel/halo.py)"
                + (
                    ", or use --backend stream (in-place single-buffer "
                    "kernel — one padded state buffer, runs up to "
                    "18432^2 on a 16 GB chip)"
                    if stream_helps
                    else ""  # beyond even one padded buffer: multi-chip
                )
                + (
                    "; --debug forces the fused 3x-state path at this "
                    "size — drop it to use the streaming tier"
                    if debug_helps
                    else ""
                )
            )

    def _is_sharded(
        self, devices: int | None, mesh: tuple[int, int] | None
    ) -> bool:
        """One definition of 'this run is sharded' for warmup(), run() and
        _run_checkpointed — diverging copies here would make warmup warm a
        different path than run dispatches."""
        return (
            self.backend == "sharded"
            or (devices is not None and devices > 1)
            or mesh is not None
        )

    def _validate_flags(
        self, sharded: bool, *, debug: bool, ca_steps: int
    ) -> None:
        """Flag-composition errors, raised from BOTH warmup() and run() so
        a bad combination dies before warmup executes anything (the CLI
        warms during Init — a post-warmup raise would waste a full compile
        + first run)."""
        if ca_steps > 1 and not sharded:
            raise ValueError(
                "ca_steps > 1 is a property of the halo exchange and needs "
                "the sharded backend (--devices N or --mesh MYxMX); on one "
                "device use the pallask backend for time tiling instead"
            )

    def _sharded_runner(
        self,
        iters: int,
        devices: int | None,
        shard_kernel: str,
        mesh: tuple[int, int] | None,
        ca_steps: int,
        debug: bool = False,
    ):
        """The cached (runner, shardings) pair for a sharded configuration.
        Built once per config so warmup() and run() dispatch the SAME
        jax.jit object (a fresh jit per call would recompile).  ``debug``
        streams per-step total densities through the sharded scan (one
        extra psum'd scalar — the reference's #ifdef DEBUG output mode,
        d2q9-bgk.c:196-200, on the distributed path)."""
        from advanced_hpc_lbm_tpu.parallel import halo

        if shard_kernel == "auto":
            # resolve here (not just inside prepare_*) so the cache key
            # carries the CONCRETE kernel — warmup("auto") and a later
            # run with the matching explicit kernel share one executable
            if mesh is not None:
                shard_kernel = halo.resolve_shard_kernel(
                    self.params, mesh_shape=mesh, ca_steps=ca_steps
                )
            else:
                n = devices if devices is not None else len(jax.devices())
                shard_kernel = halo.resolve_shard_kernel(
                    self.params, n_devices=n, ca_steps=ca_steps
                )
        key = ("sharded", iters, devices, shard_kernel, mesh, ca_steps, debug)
        cached = self._compiled.get(key)
        if cached is not None:
            return cached

        if mesh is not None:
            pair = halo.prepare_sharded_2d(
                self.params, iters, mesh, kernel=shard_kernel,
                ca_steps=ca_steps, collect_density=debug,
            )
        else:
            pair = halo.prepare_sharded(
                self.params, iters, n_devices=devices, kernel=shard_kernel,
                ca_steps=ca_steps, collect_density=debug,
            )
        self._compiled[key] = pair
        return pair

    def warmup(
        self,
        *,
        n_iters: int | None = None,
        debug: bool = False,
        devices: int | None = None,
        shard_kernel: str = "auto",
        mesh: tuple[int, int] | None = None,
        ca_steps: int = 1,
        checkpoint_every: int | None = None,
        checkpoint_dir: str | os.PathLike = "checkpoints",
        resume: bool = False,
    ) -> None:
        """AOT-compile (and first-run) the exact executable ``run`` will
        dispatch.

        The reference's Compute timer measures pure compute
        (d2q9-bgk.c:177-206); calling this during the Init phase keeps that
        contract here too — on TPU the (multi-second, remote) Mosaic/XLA
        compile lands in Init, and ``run`` then invokes the stored compiled
        executable.  Pass the same ``devices``/``mesh``/``shard_kernel``/
        ``ca_steps`` the run will use to warm the sharded path (the runner
        is cached per config and reused by ``run``).  With
        ``checkpoint_every``/``resume``, warms the FIRST segment's
        executable (keyed by segment length, which the segment loop looks
        up) — a different-length tail segment still compiles mid-run."""
        iters = self.params.max_iters if n_iters is None else n_iters
        sharded = self._is_sharded(devices, mesh)
        self._validate_flags(sharded, debug=debug, ca_steps=ca_steps)
        if checkpoint_every or resume:
            start = 0
            if resume:
                from advanced_hpc_lbm_tpu.utils.checkpoint import (
                    CheckpointManager,
                )

                # latest_step (not steps()[-1]): _run_checkpointed skips
                # unreadable newest snapshots, and warming a segment the
                # run won't execute would land the real compile in Compute
                start = CheckpointManager(checkpoint_dir).latest_step()
            if start >= iters:
                return  # resume is already at/past the target: no compute
            iters = min(checkpoint_every or iters, iters - start)
        if sharded:
            from advanced_hpc_lbm_tpu.parallel import halo

            key = (
                "warmed", iters, devices, shard_kernel, mesh, ca_steps, debug
            )
            if key in self._compiled:
                return
            runner, sh = self._sharded_runner(
                iters, devices, shard_kernel, mesh, ca_steps, debug
            )
            out = halo.execute_sharded(
                runner, sh, self.initial_state(),
                jnp.asarray(self.obstacles), self.params,
            )
            # finish the throwaway run AND absorb the one-time
            # device->host path cost with a 4-byte token — fetching the
            # full tree here would pull the entire multi-GB sharded state
            # through the tunnel during Init (ADVICE round 3)
            np.asarray(out[1][-1:])
            self._compiled[key] = True
            return
        self._check_single_chip_fit(debug)
        key = (iters, debug)
        if key in self._compiled:
            return
        runner = self._make_device_runner(iters, debug)
        if not hasattr(runner, "lower"):
            # composite runner (the stream padded-native tier): compile
            # its phases via the warmup hook — a throwaway execution
            # here would run the whole deck, minutes of device time at
            # the sizes that select this path — then absorb the first
            # device->host transfer cost with a tiny materialization
            runner.warmup()
            np.asarray(jnp.zeros((8, 128), jnp.float32) + 1.0)
            self._compiled[key] = runner
            return
        f_s = jax.ShapeDtypeStruct(
            (9, self.params.ny, self.params.nx), jnp.float32
        )
        o_s = jax.ShapeDtypeStruct((self.params.ny, self.params.nx), jnp.bool_)
        compiled = runner.lower(f_s, o_s).compile()
        # execute once on throwaway inputs AND pull the results to host:
        # the first device->host transfer in a process pays a large
        # one-time path-establishment cost through the device tunnel
        # (measured: 10-160 s, independent of the AOT compile and of
        # block_until_ready) — absorb both here so Compute stays pure
        # compute
        out = compiled(self.initial_state(), jnp.asarray(self.obstacles))
        jax.tree.map(np.asarray, out)
        self._compiled[key] = compiled

    def run(
        self,
        *,
        n_iters: int | None = None,
        debug: bool = False,
        devices: int | None = None,
        checkpoint_every: int | None = None,
        checkpoint_dir: str | os.PathLike = "checkpoints",
        resume: bool = False,
        check_finite: bool = False,
        shard_kernel: str = "auto",
        mesh: tuple[int, int] | None = None,
        ca_steps: int = 1,
        fetch: bool = True,
    ) -> SimulationResult:
        """Execute the main loop fully on-device and fetch results.

        ``debug`` also collects per-step total densities (the reference's
        #ifdef DEBUG stream, d2q9-bgk.c:196-200).  ``devices`` > 1 selects
        the sharded path over a 1-D y mesh (parallel/halo.py); ``mesh`` =
        (my, mx) selects the 2-D torus; ``ca_steps`` = K exchanges halos
        every K steps (communication-avoiding ghost zones, 1-D path; with
        ``shard_kernel="pallas"`` the ±K window runs the Mosaic CA kernel,
        VMEM-gated).
        ``checkpoint_every`` snapshots the distribution array every N steps
        (utils/checkpoint.py); ``resume`` restarts from the latest snapshot.
        ``fetch=False`` waits for the computation but leaves the result
        arrays on device — call ``result.collate()`` to bring them to host
        (the CLI times that as the Collate phase, mirroring the reference's
        compute/collate timer split; a deferred ``check_finite`` then runs
        at collate time).  Exception: checkpointed runs fetch per segment
        regardless (snapshots are host-side), so there ``collate()`` is a
        no-op and ``check_finite`` applies during the run.
        """
        iters = self.params.max_iters if n_iters is None else n_iters
        sharded = self._is_sharded(devices, mesh)
        self._validate_flags(sharded, debug=debug, ca_steps=ca_steps)
        if not sharded:
            self._check_single_chip_fit(debug)
        if checkpoint_every or resume:
            result = self._run_checkpointed(
                iters, checkpoint_every or iters, checkpoint_dir, resume,
                debug=debug, devices=devices, shard_kernel=shard_kernel,
                mesh=mesh, ca_steps=ca_steps,
            )
            if check_finite:
                self._assert_finite(result)
            return result
        obstacles = jnp.asarray(self.obstacles)

        if sharded:
            from advanced_hpc_lbm_tpu.parallel import halo

            runner, sh = self._sharded_runner(
                iters, devices, shard_kernel, mesh, ca_steps, debug
            )
            out = halo.execute_sharded(
                runner, sh, self.initial_state(), obstacles, self.params
            )
            if debug:
                f_final, av_vels, densities = out
            else:
                f_final, av_vels = out
                densities = None
        else:
            runner = self._compiled.get((iters, debug))
            if runner is None:
                runner = self._make_device_runner(iters, debug)
            # the padded-native tier builds equilibrium directly at its
            # padded shape — allocating the unpadded f0 here would burn
            # a state-sized device buffer for nothing at 16384²+
            f0 = (
                None
                if getattr(runner, "padded_native", False)
                else self.initial_state()
            )
            out = runner(f0, obstacles)
            if debug:
                f_final, av_vels, densities = out
            else:
                f_final, av_vels = out
                densities = None

        if fetch:
            f_final = np.asarray(jax.device_get(f_final))
            av_vels = np.asarray(jax.device_get(av_vels))
            densities = None if densities is None else np.asarray(densities)
        else:
            # computation must FINISH inside the caller's compute window
            # (dispatch is async); only the bulk transfer is deferred to
            # collate().  block_until_ready alone has under-reported
            # through the device tunnel (CLAUDE.md), so also materialize a
            # 4-byte token from the run's last output to host — a real
            # round-trip pinned to completion, without the bulk bytes.
            # (the padded-native tier already returns host numpy arrays —
            # nothing to wait on there)
            if hasattr(f_final, "block_until_ready"):
                f_final.block_until_ready()
                av_vels.block_until_ready()
                if densities is not None:
                    densities.block_until_ready()
                np.asarray(av_vels[-1:])
        result = SimulationResult(
            params=self.params,
            f_final=f_final,
            av_vels=av_vels,
            densities=densities,
        )
        result._obstacles_cache = self.obstacles
        if check_finite:
            if fetch:
                self._assert_finite(result)
            else:
                result._check_finite_pending = True
        return result

    @staticmethod
    def _assert_finite(result: SimulationResult) -> None:
        """Numerical-health gate (the sanitizer tier the reference lacks,
        SURVEY.md section 5): a blown-up run fails loudly with the first
        bad step instead of writing NaN output files."""
        if not np.all(np.isfinite(result.f_final)):
            raise FloatingPointError("non-finite values in final state")
        bad = np.flatnonzero(~np.isfinite(result.av_vels))
        if bad.size:
            raise FloatingPointError(
                f"non-finite av_velocity first at step {int(bad[0])}"
            )

    def _run_checkpointed(
        self,
        iters: int,
        every: int,
        checkpoint_dir: str | os.PathLike,
        resume: bool,
        *,
        debug: bool = False,
        devices: int | None = None,
        shard_kernel: str = "auto",
        mesh: tuple[int, int] | None = None,
        ca_steps: int = 1,
    ) -> SimulationResult:
        """Host-level segment loop with snapshots at segment boundaries.

        Segments of ``every`` steps run fully on-device (a fixed segment
        length compiles once); the distribution array + av history are
        snapshotted between segments (utils/checkpoint.py).  Honors the same
        execution configuration as a straight run: ``devices``/``sharded``
        runs each segment through the halo-exchanged mesh path, ``debug``
        collects per-step densities per segment.
        """
        from advanced_hpc_lbm_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        obstacles = jnp.asarray(self.obstacles)
        start = 0
        av_parts: list[np.ndarray] = []
        # None = "the deterministic initial condition"; materialized lazily
        # because the padded-native stream tier builds equilibrium at its
        # own padded shape (an unpadded device f0 would waste a
        # state-sized buffer at 16384²+ — and resumed state must stay a
        # HOST array for that tier, which pads host-side)
        f: np.ndarray | jax.Array | None = None
        density_parts: list[np.ndarray] = []
        if resume:
            latest = mgr.latest()
            if latest is not None:
                start, f_np, av_prev, dens_prev = latest
                f = f_np
                if start > iters:
                    raise ValueError(
                        f"checkpoint at step {start} is beyond requested {iters}"
                    )
                av_parts.append(np.asarray(av_prev)[:start])
                if debug:
                    # keep result.densities step-aligned with av_vels: a
                    # snapshot written without --debug has no density
                    # history, so those steps report NaN rather than
                    # silently shifting later segments' values earlier
                    density_parts.append(
                        np.asarray(dens_prev)[:start]
                        if dens_prev is not None
                        else np.full((start,), np.nan, np.float32)
                    )

        # segments use the same backend configuration a straight run would
        sharded = self._is_sharded(devices, mesh)
        if sharded:
            from advanced_hpc_lbm_tpu.parallel import halo

            def make_runner(seg):
                # the cached (runner, shardings) pair: segments of equal
                # length reuse ONE jit object instead of re-tracing
                # halo.run_sharded per segment
                runner, sh = self._sharded_runner(
                    seg, devices, shard_kernel, mesh, ca_steps, debug
                )

                def _run(ff, oo):
                    return halo.execute_sharded(
                        runner, sh, ff, oo, self.params
                    )
                return _run
        else:
            # same executables a straight run would use (incl. the
            # whole-run resident/pallask kernels and their guards)
            def make_runner(seg):
                return self._make_device_runner(seg, debug)

        runners: dict[int, object] = {}

        def get_runner(seg):
            r = runners.get(seg)
            if r is None:
                # reuse the executable warmup() AOT-compiled during Init
                # (keyed (seg, debug)) so the segment loop's Compute time
                # stays pure compute, like the straight run's
                r = (
                    None if sharded else self._compiled.get((seg, debug))
                ) or make_runner(seg)
                runners[seg] = r
            return r

        # construct every distinct segment-length runner UPFRONT: runner
        # construction is where length constraints fail (e.g. the padded
        # stream tier's K=8 multiple), and a non-conforming TAIL segment
        # must die before the first segment burns minutes of device time
        seg_lengths: list[int] = []
        d = start
        while d < iters:
            s = min(every, iters - d)
            seg_lengths.append(s)
            d += s
        for s in dict.fromkeys(seg_lengths):
            get_runner(s)

        done = start
        while done < iters:
            seg = min(every, iters - done)
            runner = get_runner(seg)
            if getattr(runner, "padded_native", False):
                # host state in (padded host-side), host state out
                f_in = (
                    f
                    if f is None or isinstance(f, np.ndarray)
                    else np.asarray(jax.device_get(f))
                )
            else:
                if f is None:
                    f = self.initial_state()
                f_in = jnp.asarray(f) if isinstance(f, np.ndarray) else f
            out = runner(f_in, obstacles)
            if debug:
                f, av_seg, dens_seg = out
                density_parts.append(np.asarray(jax.device_get(dens_seg)))
            else:
                f, av_seg = out
            av_parts.append(np.asarray(jax.device_get(av_seg)))
            done += seg
            mgr.save(
                done,
                np.asarray(jax.device_get(f)),
                np.concatenate(av_parts),
                densities=(
                    np.concatenate(density_parts) if debug else None
                ),
            )

        if f is None:  # zero-iteration run: nothing executed
            f = self.initial_state()
        result = SimulationResult(
            params=self.params,
            f_final=np.asarray(jax.device_get(f)),
            av_vels=(
                np.concatenate(av_parts)
                if av_parts
                else np.zeros((0,), np.float32)
            ),
            densities=(
                np.concatenate(density_parts) if density_parts else None
            ),
        )
        result._obstacles_cache = self.obstacles
        return result
