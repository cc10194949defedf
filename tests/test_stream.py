"""HBM-streaming K-step kernel vs the jnp oracle (interpret mode).

ops.pallas_stream assembles each tile's ±K ghost window by explicit DMA
from the HBM-resident state and hand-double-buffers the pipeline; any
error in the chunked window assembly (wrap rows, mask chunks, egress
rows) or the cross-tile semaphore ordering shows up against the oracle
immediately."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, pallas_stream, reference
from advanced_hpc_lbm_tpu.params import LBMParams


@pytest.fixture(scope="module")
def deck():
    params = LBMParams(
        nx=128, ny=32, max_iters=16, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(31)
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[10:14, 40:80] = True
    for _ in range(6):
        mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
    return params, mask


def test_multi_step_matches_k_oracle_steps(deck):
    params, mask = deck
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    f = reference.initial_state(params)

    f_ref, avs_ref = f, []
    for _ in range(pallas_stream.K):
        f_ref, av = fused.fused_step(f_ref, obst, n_fluid, params)
        avs_ref.append(float(av))

    f_s, av_s = pallas_stream.multi_step(
        f, pallas_stream.prepare_obstacles(obst), n_fluid, params,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(f_s), np.asarray(f_ref), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(av_s), avs_ref, rtol=5e-4)


def test_run_full_loop_with_tail(deck):
    """2 scan pairs + a K-sized mid chunk + a 1-step tail (43 = 2*16 + 8
    + 3 single steps) — exercises every composition path in run(),
    including run_padded's odd mid-chunk branch (done % 2K == K)."""
    params, mask = deck
    obst = jnp.asarray(mask)
    n_iters = 43
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=n_iters)
    fb, avb = pallas_stream.run(
        reference.initial_state(params), obst, params,
        n_iters=n_iters, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_initial_state_padded_matches_pad(deck):
    """Padded-native equilibrium == pad_state(initial_state) — the
    16384²+ entry point that never holds unpadded + padded together."""
    params, _ = deck
    np.testing.assert_array_equal(
        np.asarray(pallas_stream.initial_state_padded(params)),
        np.asarray(pallas_stream.pad_state(reference.initial_state(params))),
    )


def test_forcing_row_in_ghost_image(deck):
    """The forcing row (ny-2) sits K-deep in the wrap ghost of tile 0's
    window; the mod-ny row-id mask must force it there too.  A taller
    single-tile grid (ty=ny) exercises the pure-wrap case."""
    params = LBMParams(
        nx=128, ny=24, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=8)
    fb, avb = pallas_stream.multi_step(
        reference.initial_state(params),
        pallas_stream.prepare_obstacles(obst), n_fluid, params,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


@pytest.mark.parametrize("force_ty", [None, "16"])
def test_inplace_matches_oracle(deck, monkeypatch, force_ty):
    """The in-place (input_output_aliases) schedule is bit-equivalent to
    the out-of-place kernel: single-tile AND forced 3-tile (ty=16 on the
    32-row deck) — the multi-tile case exercises the deferred
    egress-start, the high-pad stash, and the last-iteration pad writes.
    Interpret mode executes the same program order the semaphores
    enforce on hardware, so oracle equality here validates the
    hazard-ordered schedule."""
    params, mask = deck
    if force_ty:
        monkeypatch.setenv("LBM_STREAM_TY", force_ty)
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)

    f_ref = reference.initial_state(params)
    avs_ref = []
    for _ in range(2 * pallas_stream.K):
        f_ref, av = fused.fused_step(f_ref, obst, n_fluid, params)
        avs_ref.append(float(av))

    obst_pad = pallas_stream.prepare_obstacles(obst)
    fp = pallas_stream.pad_state(reference.initial_state(params))
    avs = []
    for _ in range(2):
        fp, av = pallas_stream.multi_step_padded(
            fp, obst_pad, n_fluid, params, interpret=True, inplace=True
        )
        avs.append(np.asarray(av))
    np.testing.assert_allclose(
        np.asarray(pallas_stream.unpad_state(fp)),
        np.asarray(f_ref),
        rtol=1e-5,
        atol=1e-8,
    )
    np.testing.assert_allclose(np.concatenate(avs), avs_ref, rtol=5e-4)


def test_inplace_run_full_loop(deck):
    """run(inplace=True): one-call-per-body scan + tail composition."""
    params, mask = deck
    obst = jnp.asarray(mask)
    n_iters = 27
    fa, ava = fused.run_simulation(
        reference.initial_state(params), obst, params, n_iters=n_iters
    )
    fb, avb = pallas_stream.run(
        reference.initial_state(params), obst, params,
        n_iters=n_iters, interpret=True, inplace=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_multi_tile_pipeline(deck, monkeypatch):
    """Force ty=16 so the 32-row deck runs TWO tiles per pass (grid=(2,)
    over 2 passes of the pipeline machinery): cross-tile prefetch,
    parity double-buffering, deferred egress drain, and the top/bottom
    pad writes coming from DIFFERENT tiles (0 and n-1) are all dead code
    on the default single-tile test grids — a drain-order or pad-offset
    bug for n>1 would otherwise only surface as silent corruption on
    hardware."""
    params, mask = deck
    monkeypatch.setenv("LBM_STREAM_TY", "16")
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    f = reference.initial_state(params)

    f_ref = f
    avs_ref = []
    for _ in range(2 * pallas_stream.K):
        f_ref, av = fused.fused_step(f_ref, obst, n_fluid, params)
        avs_ref.append(float(av))

    obst_pad = pallas_stream.prepare_obstacles(obst)
    f_s, av1 = pallas_stream.multi_step(
        f, obst_pad, n_fluid, params, interpret=True
    )
    f_s, av2 = pallas_stream.multi_step(
        f_s, obst_pad, n_fluid, params, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(f_s), np.asarray(f_ref), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(av1), np.asarray(av2)]),
        avs_ref,
        rtol=5e-4,
    )


@pytest.mark.parametrize("inplace", [False, True])
def test_three_tile_middle_tile(monkeypatch, inplace):
    """A 48-row deck at ty=16 runs THREE tiles — the middle tile has
    BOTH a predecessor (whose egress it starts/drains) and a successor
    (whose ingress it prefetches), a combination absent from 1- and
    2-tile grids.  Exercised for both schedules; in-place additionally
    runs its full stash/deferred-pad machinery with a neutral middle
    tile in between."""
    params = LBMParams(
        nx=128, ny=48, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(7)
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[20:25, 30:90] = True
    for _ in range(8):
        mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
    monkeypatch.setenv("LBM_STREAM_TY", "16")
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(~obst).astype(jnp.float32)

    f_ref = reference.initial_state(params)
    avs_ref = []
    for _ in range(pallas_stream.K):
        f_ref, av = fused.fused_step(f_ref, obst, n_fluid, params)
        avs_ref.append(float(av))

    fp = pallas_stream.pad_state(reference.initial_state(params))
    fp, av = pallas_stream.multi_step_padded(
        fp, pallas_stream.prepare_obstacles(obst), n_fluid, params,
        interpret=True, inplace=inplace,
    )
    np.testing.assert_allclose(
        np.asarray(pallas_stream.unpad_state(fp)),
        np.asarray(f_ref),
        rtol=1e-5,
        atol=1e-8,
    )
    np.testing.assert_allclose(np.asarray(av), avs_ref, rtol=5e-4)


def test_padded_runner_matches_oracle(deck):
    """make_padded_runner — the 16384²+ tier that never materializes the
    unpadded state on device (padded equilibrium init, one donated
    in-place scan, plane-wise host fetch) — is numerically identical to
    the oracle, and warmup() compiles without executing."""
    params, mask = deck
    obst = jnp.asarray(mask)
    fa, ava = fused.run_simulation(
        reference.initial_state(params), obst, params, n_iters=16
    )
    r = pallas_stream.make_padded_runner(
        obst, params, n_iters=16, interpret=True
    )
    r.warmup()
    fb, avb = r()
    assert isinstance(fb, np.ndarray) and isinstance(avb, np.ndarray)
    np.testing.assert_allclose(fb, np.asarray(fa), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(avb, np.asarray(ava), rtol=5e-4)
    with pytest.raises(ValueError, match="n_iters % 8"):
        pallas_stream.make_padded_runner(obst, params, n_iters=17)


def test_model_selects_padded_tier(monkeypatch):
    """When the 2x-state jit form exceeds HBM but one padded buffer
    fits, the stream backend builds the composite padded-native runner
    (warmup hook, no .lower) instead of a jit."""
    from advanced_hpc_lbm_tpu.models import d2q9_bgk

    # 16384²: 2x state + mask = 19.9 GiB > 0.9*16 GiB; padded tier
    # = 9.01 + 1.0 + 1.0 GiB fits
    monkeypatch.setattr(d2q9_bgk, "_device_hbm_bytes", lambda: 16 * 2**30)
    monkeypatch.setattr(pallas_stream, "supported", lambda ny, nx: True)
    n = 16384
    params = LBMParams(
        nx=n, ny=n, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = d2q9_bgk.Simulation(
        params, np.zeros((n, n), dtype=bool), backend="auto"
    )
    assert sim.backend == "stream"
    runner = sim._make_device_runner(8, False)
    assert not hasattr(runner, "lower") and hasattr(runner, "warmup")


def test_auto_falls_through_to_stream(monkeypatch):
    """Grids whose 3x-state pallask footprint exceeds HBM but whose
    2-buffer streaming footprint fits auto-select the streaming backend
    instead of failing loud later (models/d2q9_bgk._resolve_backend)."""
    from advanced_hpc_lbm_tpu.models import d2q9_bgk

    monkeypatch.setattr(d2q9_bgk, "_device_hbm_bytes", lambda: 16 * 2**30)
    monkeypatch.setattr(pallas_stream, "supported", lambda ny, nx: True)
    params = LBMParams(
        nx=12288, ny=12288, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = d2q9_bgk.Simulation(
        params, np.zeros((12288, 12288), dtype=bool), backend="auto"
    )
    assert sim.backend == "stream"


def test_auto_keeps_pallask_when_it_fits(monkeypatch):
    from advanced_hpc_lbm_tpu.models import d2q9_bgk
    from advanced_hpc_lbm_tpu.ops import pallas_k, pallas_step, resident

    monkeypatch.setattr(d2q9_bgk, "_device_hbm_bytes", lambda: 16 * 2**30)
    monkeypatch.setattr(resident, "supported", lambda ny, nx: False)
    monkeypatch.setattr(pallas_step, "supported", lambda ny, nx: True)
    monkeypatch.setattr(pallas_k, "best_k", lambda ny, nx: 6)
    params = LBMParams(
        nx=4096, ny=4096, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = d2q9_bgk.Simulation(
        params, np.zeros((4096, 4096), dtype=bool), backend="auto"
    )
    assert sim.backend == "pallask"


def test_auto_prefers_stream_at_8192(monkeypatch):
    """≥ 8192² the in-place streaming kernel is the measured winner
    (16.46 vs pallask 15.97 GLUPS interleaved,
    scripts/inplace8192_compare.py) — auto must pick it even though
    pallask's 3x-state footprint still fits."""
    from advanced_hpc_lbm_tpu.models import d2q9_bgk
    from advanced_hpc_lbm_tpu.ops import resident

    monkeypatch.setattr(d2q9_bgk, "_device_hbm_bytes", lambda: 16 * 2**30)
    monkeypatch.setattr(resident, "supported", lambda ny, nx: False)
    monkeypatch.setattr(pallas_stream, "supported", lambda ny, nx: True)
    params = LBMParams(
        nx=8192, ny=8192, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = d2q9_bgk.Simulation(
        params, np.zeros((8192, 8192), dtype=bool), backend="auto"
    )
    assert sim.backend == "stream"


class TestDeviceHbmBytes:
    """_device_hbm_bytes: memory_stats first, device_kind table second,
    and NO fixed-HBM assumption when devices can't be enumerated
    (VERDICT round-3 item 9 / ADVICE round 3)."""

    class _Dev:
        def __init__(self, platform="tpu", kind="TPU v5 lite", stats=None,
                     raise_stats=False):
            self.platform = platform
            self.device_kind = kind
            self._stats = stats
            self._raise = raise_stats

        def memory_stats(self):
            if self._raise:
                raise RuntimeError("no stats")
            return self._stats

    def _patch(self, monkeypatch, devices_fn):
        from advanced_hpc_lbm_tpu.models import d2q9_bgk

        monkeypatch.setattr(d2q9_bgk.jax, "devices", devices_fn)
        return d2q9_bgk

    def test_memory_stats_wins(self, monkeypatch):
        d = self._Dev(stats={"bytes_limit": 12345})
        m = self._patch(monkeypatch, lambda: [d])
        assert m._device_hbm_bytes() == 12345

    def test_non_tpu_returns_none(self, monkeypatch):
        m = self._patch(monkeypatch, lambda: [self._Dev(platform="cpu")])
        assert m._device_hbm_bytes() is None

    def test_devices_failure_returns_none(self, monkeypatch):
        def boom():
            raise RuntimeError("Unable to initialize backend")

        m = self._patch(monkeypatch, boom)
        assert m._device_hbm_bytes() is None

    @pytest.mark.parametrize(
        "kind,gib",
        [
            ("TPU v5 lite", 16),
            ("TPU v5e", 16),
            ("TPU v5p", 95),
            ("TPU v4", 32),
            ("TPU v6 lite", 32),
        ],
    )
    def test_kind_fallback_warns(self, monkeypatch, kind, gib):
        d = self._Dev(kind=kind, raise_stats=True)
        m = self._patch(monkeypatch, lambda: [d])
        with pytest.warns(UserWarning, match=f"assuming {gib} GiB"):
            assert m._device_hbm_bytes() == gib * 2**30

    def test_unknown_kind_assumes_smallest(self, monkeypatch):
        d = self._Dev(kind="TPU v99 mega", stats={})
        m = self._patch(monkeypatch, lambda: [d])
        with pytest.warns(UserWarning, match="unrecognized"):
            assert m._device_hbm_bytes() == 16 * 2**30


def test_debug_fit_gate_uses_fused_requirement(monkeypatch):
    """backend=stream passes the padded-tier HBM gate, but --debug falls
    back to the fused 3x-state runner — the fit check must gate on THAT
    (ADVICE round 3: a 12288^2 --debug run used to pass the gate and hit
    a raw ResourceExhausted)."""
    from advanced_hpc_lbm_tpu.models import d2q9_bgk

    monkeypatch.setattr(d2q9_bgk, "_device_hbm_bytes", lambda: 16 * 2**30)
    monkeypatch.setattr(pallas_stream, "supported", lambda ny, nx: True)
    n = 12288
    params = LBMParams(
        nx=n, ny=n, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = d2q9_bgk.Simulation(
        params, np.zeros((n, n), dtype=bool), backend="stream"
    )
    sim._check_single_chip_fit(False)  # padded tier fits: no raise
    with pytest.raises(ValueError, match="--debug forces the fused"):
        sim._check_single_chip_fit(True)


@pytest.mark.parametrize("inplace", [False, True])
def test_trapezoid_bitwise_equals_full_window(deck, monkeypatch, inplace):
    """The static-slice trapezoid step (lean_window_step_rows) computes
    only the rows still valid after each step; own rows and the av
    reduction must be BITWISE equal to the full-window wrap-garbage form
    (same per-row fp ops), on both DMA schedules, across a 4-tile
    pipeline."""
    params, mask = deck
    monkeypatch.setenv("LBM_STREAM_TY", "16")
    obst = jnp.asarray(mask)
    n_fluid = jnp.sum(obst == 0).astype(jnp.float32)
    obst_pad = pallas_stream.prepare_obstacles(obst)
    fp = pallas_stream.pad_state(reference.initial_state(params))
    a_f, a_av = pallas_stream.multi_step_padded(
        fp, obst_pad, n_fluid, params, interpret=True, inplace=inplace
    )
    b_f, b_av = pallas_stream.multi_step_padded(
        fp, obst_pad, n_fluid, params, interpret=True, inplace=inplace,
        trapezoid=True,
    )
    np.testing.assert_array_equal(
        np.asarray(pallas_stream.unpad_state(a_f)),
        np.asarray(pallas_stream.unpad_state(b_f)),
    )
    np.testing.assert_array_equal(np.asarray(a_av), np.asarray(b_av))
