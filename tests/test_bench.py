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


# ---------------------------------------------------------------------------
# Backend-init retry (VERDICT round-3 item 1): round 3's driver capture was
# lost to one unretried transient 'Unable to initialize backend' — the probe
# must absorb a bounded number of those, log each to stderr, and still fail
# loudly on a persistent outage or a non-init error.

_INIT_ERR = RuntimeError(
    "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
    "setup/compile error (Unavailable)."
)


def _flaky(fail_times, result="devices"):
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise _INIT_ERR
        return result

    fn.calls = calls
    return fn


def test_wait_for_device_retries_transient_outage(capsys):
    sleeps = []
    fn = _flaky(fail_times=2)
    out = bench.wait_for_device(
        attempts=5, backoff_s=0.5, _devices_fn=fn, _sleep=sleeps.append
    )
    assert out == "devices"
    assert fn.calls["n"] == 3
    assert sleeps == [0.5, 0.5]
    err = capsys.readouterr()
    # retries go to stderr only — stdout keeps the one-JSON-line contract
    assert err.out == ""
    assert err.err.count("backend init failed") == 2


def test_wait_for_device_exhausts_and_raises():
    fn = _flaky(fail_times=10)
    with pytest.raises(RuntimeError, match="Unable to initialize backend"):
        bench.wait_for_device(attempts=3, backoff_s=0, _devices_fn=fn,
                              _sleep=lambda s: None)
    assert fn.calls["n"] == 3  # bounded: no infinite retry loop


def test_wait_for_device_propagates_non_init_errors_immediately():
    def fn():
        raise RuntimeError("something else entirely")

    with pytest.raises(RuntimeError, match="something else"):
        bench.wait_for_device(attempts=5, backoff_s=0, _devices_fn=fn,
                              _sleep=lambda s: None)


# ---------------------------------------------------------------------------
# De-silenced auto-selection fallback (VERDICT round-3 weak #3): a broken
# kernel import must be visible on stderr, and the --matrix gate must fail
# when "best" lands on the fused fallback on a TPU device.


def test_resolve_backend_fallback_is_loud(monkeypatch, capsys):
    monkeypatch.setattr(
        resident, "supported",
        lambda ny, nx: (_ for _ in ()).throw(ValueError("broken tier")),
    )
    assert bench.resolve_backend("best", 1024, 1024) == "fused"
    err = capsys.readouterr().err
    assert "falling back to 'fused'" in err
    assert "broken tier" in err


def test_matrix_fails_when_best_resolves_to_fused_on_tpu(monkeypatch, capsys):
    import jax

    class _FakeDev:
        platform = "tpu"
        device_kind = "fake-tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_FakeDev()])
    monkeypatch.setattr(
        bench, "measure",
        lambda size, iters, backend, repeats: (99.0, 99.0, "fused", [1.0]),
    )
    monkeypatch.setattr(bench, "MATRIX", [("1024x1024", 8, 28.25)])
    rc = bench.run_matrix(repeats=1)
    assert rc == 1
    import json

    line = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert line["pass"] is False
    assert "fused" in line["error"]


def test_headline_json_carries_stability_fields(monkeypatch, capsys):
    """The headline line keeps `value` (the driver's contract) and adds
    best/median/repeats so round-over-round drift is attributable
    (VERDICT round-4 item 7)."""
    import json

    monkeypatch.setattr(bench, "wait_for_device", lambda *a, **k: ["dev"])
    monkeypatch.setattr(
        bench, "measure",
        lambda size, iters, backend, repeats: (
            28.0, 27.5, "resident", [0.75, 0.76, 0.77],
        ),
    )
    rc = bench.main(["--iters", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # stdout stays one JSON line
    line = json.loads(out[0])
    assert line["value"] == line["best"] == 28.0
    assert line["median"] == 27.5
    assert line["repeats"] == 3
    assert line["unit"] == "GLUPS"


def test_matrix_huge_entries_are_stream_tier_sizes(tpu_like):
    """The huge gate guards the stream tiers specifically — if auto-select
    ever stops routing those sizes to 'stream', the guard is meaningless."""
    for size, iters, _ in bench.MATRIX_HUGE:
        nx, ny = (int(v) for v in size.split("x"))
        assert bench.resolve_backend("best", ny, nx) == "stream"
        assert iters % 8 == 0  # padded-native tier runs K=8 steps per pass
