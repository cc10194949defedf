"""Performance instrumentation — the TPU analogue of the reference's
gprof/Intel-Advisor methodology (profile.txt, e000/ roofline project).

Provides:
* ``lups`` / ``roofline_report`` — throughput and HBM-roofline numbers for
  a measured run (the reference's measured single-core ceiling was
  13.09 GB/s DRAM, e000/hs000/metrics.advisum:13-15; a v5e chip's HBM is
  ~819 GB/s, which bounds this fp32 stencil at ~11 GLUPS);
* ``trace`` — context manager around jax.profiler for capturing a device
  trace viewable in TensorBoard/Perfetto (wired to the CLI --profile flag).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

# one step moves 9 fp32 planes in + out plus an int8 mask read
BYTES_PER_CELL_STEP = 9 * 4 * 2 + 1
# published HBM bandwidths (GB/s) by device kind substring
_HBM_GBPS = {
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6": 1640.0,
    "cpu": 50.0,
}


@dataclasses.dataclass
class BenchResult:
    nx: int
    ny: int
    iters: int
    elapsed_s: float

    @property
    def mlups(self) -> float:
        return self.nx * self.ny * self.iters / self.elapsed_s / 1e6

    @property
    def glups(self) -> float:
        return self.mlups / 1e3

    @property
    def effective_gbps(self) -> float:
        """Achieved HBM traffic assuming the single-pass roofline."""
        return self.nx * self.ny * self.iters * BYTES_PER_CELL_STEP / self.elapsed_s / 1e9


def device_hbm_gbps() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return None


def roofline_report(result: BenchResult) -> str:
    lines = [
        f"grid {result.nx}x{result.ny}, {result.iters} iters in "
        f"{result.elapsed_s:.3f} s",
        f"throughput: {result.glups:.3f} GLUPS ({result.mlups:.0f} MLUPS)",
        f"effective HBM traffic (single-pass model): "
        f"{result.effective_gbps:.0f} GB/s",
    ]
    peak = device_hbm_gbps()
    if peak:
        ceiling = peak / BYTES_PER_CELL_STEP  # GLUPS
        lines.append(
            f"HBM roofline: {peak:.0f} GB/s -> {ceiling:.1f} GLUPS ceiling; "
            f"achieved {100 * result.glups / ceiling:.0f}% of roofline"
        )
        lines.append(
            "note: nominal-BW model. Measured on this device (BENCH.md "
            "probe series): working sets <= ~40 MB are VMEM-promoted "
            "(the 'roofline' is then VMEM streaming, and >100% of the "
            "nominal model is real), while 300+ MB states stream at the "
            "big-array memcpy bound (~0.3-0.65x nominal); the K-step "
            "backend trades compute for bytes exactly there."
        )
    return "\n".join(lines)


def measure(run_fn, nx: int, ny: int, iters: int) -> BenchResult:
    """Time run_fn() (which must block until done) and wrap the numbers."""
    tic = time.perf_counter()
    run_fn()
    return BenchResult(nx=nx, ny=ny, iters=iters, elapsed_s=time.perf_counter() - tic)


@contextlib.contextmanager
def trace(trace_dir: str):
    """jax.profiler trace of the enclosed block (TensorBoard/Perfetto)."""
    import jax.profiler

    with jax.profiler.trace(trace_dir):
        yield
