"""bench.py's backend auto-selection must mirror the model's — a
divergence here means the regression gate measures a different kernel
than the CLI ships (caught once in review: the ≥8192² stream pick was
missing the model's HBM-fit gate)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root: bench.py is not part of the package
import bench  # noqa: E402

from advanced_hpc_lbm_tpu.models import d2q9_bgk  # noqa: E402
from advanced_hpc_lbm_tpu.ops import (  # noqa: E402
    pallas_k,
    pallas_step,
    pallas_stream,
    resident,
)


@pytest.fixture
def tpu_like(monkeypatch):
    """Pretend to be the 16 GiB v5e with every kernel tier available."""
    monkeypatch.setattr(d2q9_bgk, "_device_hbm_bytes", lambda: 16 * 2**30)
    monkeypatch.setattr(resident, "supported", lambda ny, nx: ny * nx * 36 <= 37.75 * 2**20)
    monkeypatch.setattr(pallas_stream, "supported", lambda ny, nx: True)
    monkeypatch.setattr(pallas_step, "supported", lambda ny, nx: True)
    monkeypatch.setattr(pallas_k, "best_k", lambda ny, nx: 6)


def _model_choice(ny, nx):
    params = __import__(
        "advanced_hpc_lbm_tpu.params", fromlist=["LBMParams"]
    ).LBMParams(
        nx=nx, ny=ny, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = d2q9_bgk.Simulation(
        params, np.zeros((ny, nx), dtype=bool), backend="auto"
    )
    return sim.backend


@pytest.mark.parametrize(
    "ny,nx",
    [
        (1024, 1024),   # resident
        (4096, 4096),   # pallask
        (8192, 8192),   # stream (in-place jit, measured winner)
        (12288, 12288), # stream (in-place jit, only form that fits)
        (16384, 16384), # stream (padded-native tier)
        (18432, 18432), # stream (padded-native, the single-chip ceiling)
        (20480, 20480), # NOT stream: one padded buffer alone > 0.9 HBM
    ],
)
def test_bench_mirrors_model_selection(tpu_like, ny, nx):
    assert bench.resolve_backend("best", ny, nx) == _model_choice(ny, nx)


def test_20480_does_not_pick_stream(tpu_like):
    """Beyond 18432² even ONE padded buffer + masks exceeds HBM — bench
    must not OOM mid-benchmark; the model raises the multi-chip error."""
    assert bench.resolve_backend("best", 20480, 20480) != "stream"
