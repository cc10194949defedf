"""Sharded-vs-single-device equivalence on the virtual 8-device CPU mesh.

This is the distributed test tier the reference never had (its array job
ran 5 independent copies — job_submit_array:11); here we assert the
halo-exchanged decomposition reproduces the single-device trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, reference
from advanced_hpc_lbm_tpu.parallel import halo
from advanced_hpc_lbm_tpu.params import LBMParams


@pytest.fixture(scope="module")
def deck():
    params = LBMParams(
        nx=32, ny=64, max_iters=40, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(7)
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[20:24, 10:16] = True
    for _ in range(8):
        mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
    return params, mask


def test_eight_devices_available():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_sharded_matches_single(deck, n_devices):
    params, mask = deck
    f0 = reference.initial_state(params)
    obst = jnp.asarray(mask)

    f_ref, av_ref = fused.run_simulation(f0, obst, params, n_iters=params.max_iters)
    f_sh, av_sh = halo.run_sharded(
        reference.initial_state(params), obst, params, n_devices=n_devices
    )

    # identical math modulo reduction order: bitwise for the field,
    # ~1 ulp for the psum'd scalar
    np.testing.assert_allclose(
        np.asarray(f_sh), np.asarray(f_ref), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(av_sh), np.asarray(av_ref), rtol=1e-5
    )


def test_sharded_rejects_indivisible(deck):
    params, mask = deck
    bad = LBMParams(
        nx=params.nx, ny=30, max_iters=2, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    f0 = reference.initial_state(bad)
    with pytest.raises(ValueError, match="not divisible"):
        halo.run_sharded(f0, jnp.zeros((30, params.nx), bool), bad, n_devices=8)


@pytest.mark.parametrize("n_devices", [2, 4])
def test_sharded_pallas_kernel_matches(n_devices):
    """The production multi-chip configuration: the Mosaic local kernel
    per shard (interpret mode here), boundary rows via ring ppermute.
    Needs a lane-aligned nx (the kernel's requirement)."""
    params = LBMParams(
        nx=128, ny=64, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(11)
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[30:34, 40:80] = True
    for _ in range(6):
        mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
    obst = jnp.asarray(mask)
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=8)
    fb, avb = halo.run_sharded(
        reference.initial_state(params), obst, params,
        n_iters=8, n_devices=n_devices, kernel="pallas", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4), (4, 2), (1, 8)])
def test_2d_mesh_matches_single(deck, mesh_shape):
    """2-D torus decomposition: rows AND columns sharded, corners carried
    by the two-phase exchange.  Any error in the corner plumbing shows up
    through the diagonal speeds immediately."""
    params, mask = deck
    obst = jnp.asarray(mask)
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=10)
    fb, avb = halo.run_sharded_2d(
        reference.initial_state(params), obst, params, mesh_shape, n_iters=10
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    # 2-D path reduces pre-collision moments (fp-identical physics)
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_2d_mesh_rejects_indivisible(deck):
    params, mask = deck
    f0 = reference.initial_state(params)
    with pytest.raises(ValueError, match="not divisible"):
        halo.run_sharded_2d(
            f0, jnp.asarray(mask), params, (3, 2), n_iters=1
        )


def test_forcing_row_crosses_shard_boundary(deck):
    """Row ny-2 lives on the last shard; make sure its effect propagates
    across shard edges identically (halo correctness around the forcing)."""
    params, mask = deck
    obst = jnp.asarray(mask)
    f0 = reference.initial_state(params)
    _, av1 = fused.run_simulation(f0, obst, params, n_iters=3)
    _, av8 = halo.run_sharded(
        reference.initial_state(params), obst, params, n_iters=3, n_devices=8
    )
    np.testing.assert_allclose(np.asarray(av8), np.asarray(av1), rtol=1e-6)


def test_driver_dryrun_contract():
    """The driver invokes dryrun_multichip(8) in a FRESH process where
    JAX_PLATFORMS is pinned to the TPU plugin with one visible chip; the
    function must self-provision the virtual CPU mesh (round-1 regression:
    MULTICHIP_r01 failed exactly here).  Run it the same way."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4), (4, 2)])
def test_2d_pallas_kernel_matches(mesh_shape):
    """2-D torus with the Mosaic local kernel per shard (interpret mode):
    rows AND columns sharded, x edges spliced from pre-shifted halo
    columns, corners carried by the two-phase exchange."""
    my, mx = mesh_shape
    params = LBMParams(
        nx=128 * mx, ny=16 * my, max_iters=8, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(13)
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[params.ny // 2 - 2 : params.ny // 2, 40:80] = True
    for _ in range(8):
        mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
    obst = jnp.asarray(mask)
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=8)
    fb, avb = halo.run_sharded_2d(
        reference.initial_state(params), obst, params, mesh_shape,
        n_iters=8, kernel="pallas", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


@pytest.mark.parametrize("n_devices,k", [(2, 2), (4, 4), (8, 3)])
def test_comm_avoiding_matches_single(deck, n_devices, k):
    """K steps per halo exchange (communication-avoiding ghost zones):
    the ring ships K rows once, each shard runs K shrinking-window steps.
    Must reproduce the single-device trajectory incl. a non-multiple tail."""
    params, mask = deck
    obst = jnp.asarray(mask)
    n_iters = 2 * k + 1  # exercises the tail path too
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=n_iters)
    fb, avb = halo.run_sharded(
        reference.initial_state(params), obst, params,
        n_iters=n_iters, n_devices=n_devices, ca_steps=k,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


@pytest.mark.parametrize("n_devices,k", [(2, 2), (4, 4), (8, 3)])
def test_comm_avoiding_pallas_matches_single(n_devices, k):
    """CA + Mosaic composition: the whole ±K ghost window runs the lean
    CA kernel per shard (interpret mode here).  Includes the 1-step-kernel
    tail and the forcing row's double appearance (own + ghost image) when
    the last shard's window wraps."""
    params = LBMParams(
        nx=128, ny=64, max_iters=32, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(23)
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[20:28, 40:70] = True
    for _ in range(6):
        mask[rng.randint(1, params.ny - 1), rng.randint(0, params.nx)] = True
    obst = jnp.asarray(mask)
    n_iters = 4 * k + 1  # >= two scan pairs + tail
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=n_iters)
    fb, avb = halo.run_sharded(
        reference.initial_state(params), obst, params,
        n_iters=n_iters, n_devices=n_devices, ca_steps=k,
        kernel="pallas", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_comm_avoiding_rejects_thin_slabs(deck):
    params, mask = deck
    f0 = reference.initial_state(params)
    with pytest.raises(ValueError, match="too thin"):
        halo.run_sharded(
            f0, jnp.asarray(mask), params, n_devices=8, ca_steps=8
        )


@pytest.mark.parametrize("mesh_shape,k", [((2, 2), 2), ((2, 4), 3), ((4, 2), 4)])
def test_comm_avoiding_2d_matches_single(deck, mesh_shape, k):
    """CA ghost zones on the 2-D torus: the two-phase ±K exchange carries
    the corner blocks, then K shrinking-window steps per exchange.  Any
    corner error shows up through the diagonal speeds immediately; the
    non-multiple tail exercises the 1-step fallback."""
    params, mask = deck
    obst = jnp.asarray(mask)
    n_iters = 2 * k + 1
    f0 = reference.initial_state(params)
    fa, ava = fused.run_simulation(f0, obst, params, n_iters=n_iters)
    fb, avb = halo.run_sharded_2d(
        reference.initial_state(params), obst, params, mesh_shape,
        n_iters=n_iters, ca_steps=k,
    )
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=5e-4)


def test_comm_avoiding_2d_rejects_thin_blocks(deck):
    params, mask = deck  # 64x32 grid
    f0 = reference.initial_state(params)
    with pytest.raises(ValueError, match="too thin"):
        halo.run_sharded_2d(
            f0, jnp.asarray(mask), params, (2, 4), n_iters=4, ca_steps=5
        )


def test_comm_avoiding_2d_rejects_pallas(deck):
    params, mask = deck
    f0 = reference.initial_state(params)
    with pytest.raises(ValueError, match="not supported on the 2-D"):
        halo.run_sharded_2d(
            f0, jnp.asarray(mask), params, (2, 2), n_iters=4,
            ca_steps=2, kernel="pallas",
        )


class TestShardedDebugDensity:
    """The reference's #ifdef DEBUG output (per-step av velocity AND total
    density, d2q9-bgk.c:196-200) on the distributed path: the density is
    one extra psum'd scalar streamed through the sharded scan (VERDICT
    round-3 item 8 — this used to raise on the sharded backend)."""

    def _single_device_debug(self, deck, n_iters):
        params, mask = deck
        obst = jnp.asarray(mask)
        return fused.run_simulation(
            reference.initial_state(params), obst, params, n_iters=n_iters,
            collect_density=True,
        )

    @pytest.mark.parametrize("n_devices", [2, 4])
    def test_1d_matches_single_device_stream(self, deck, n_devices):
        params, mask = deck
        obst = jnp.asarray(mask)
        f_ref, av_ref, dens_ref = self._single_device_debug(deck, 40)
        f_sh, av_sh, dens_sh = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=n_devices, collect_density=True,
        )
        np.testing.assert_allclose(
            np.asarray(f_sh), np.asarray(f_ref), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(av_sh), np.asarray(av_ref), rtol=1e-5
        )
        # density = psum of per-shard sums vs one global fp32 sum:
        # summation-order error only (the fp64 masses are identical;
        # a sequential fp32 sum of 18k elements carries ~1e-4 relative)
        np.testing.assert_allclose(
            np.asarray(dens_sh), np.asarray(dens_ref), rtol=1e-4
        )
        assert dens_sh.shape == (40,)

    def test_2d_mesh_density(self, deck):
        params, mask = deck
        obst = jnp.asarray(mask)
        _, _, dens_ref = self._single_device_debug(deck, 40)
        _, av, dens = halo.run_sharded_2d(
            reference.initial_state(params), obst, params, (2, 2),
            collect_density=True,
        )
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(dens_ref), rtol=1e-4
        )
        assert av.shape == dens.shape == (40,)

    @pytest.mark.parametrize("kernel", ["jnp"])
    def test_ca_density(self, deck, kernel):
        """CA ghost zones (K steps per exchange) still emit one density
        per STEP (own-rows sum of each intermediate window)."""
        params, mask = deck
        obst = jnp.asarray(mask)
        _, _, dens_ref = self._single_device_debug(deck, 40)
        _, av, dens = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=4, ca_steps=4, kernel=kernel, collect_density=True,
        )
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(dens_ref), rtol=1e-4
        )
        assert dens.shape == (40,)

    def test_pallas_kernel_density_interpret(self):
        """kernel='pallas' streams densities too (computed OUTSIDE the
        opaque kernel from the post-step slab).  Lane-aligned nx (the
        Mosaic kernel's requirement)."""
        params = LBMParams(
            nx=128, ny=64, max_iters=40, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        mask = np.zeros((params.ny, params.nx), dtype=bool)
        mask[0] = mask[-1] = True
        mask[30:34, 40:80] = True
        obst = jnp.asarray(mask)
        _, _, dens_ref = self._single_device_debug((params, mask), 40)
        _, av, dens = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=2, kernel="pallas", interpret=True,
            collect_density=True,
        )
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(dens_ref), rtol=1e-4
        )

    def test_model_run_sharded_debug(self, deck):
        """Simulation.run(devices=N, debug=True) — the user-facing
        composition — returns the density stream and matches the
        single-device debug run."""
        from advanced_hpc_lbm_tpu.models.d2q9_bgk import Simulation

        params, mask = deck
        single = Simulation(params, mask, backend="fused").run(
            n_iters=24, debug=True
        )
        sharded = Simulation(params, mask, backend="fused").run(
            n_iters=24, devices=4, debug=True
        )
        assert sharded.densities is not None
        np.testing.assert_allclose(
            sharded.densities, single.densities, rtol=1e-4
        )
        # and both sit at the analytic mass (density * n_cells = 204.8)
        np.testing.assert_allclose(
            sharded.densities, params.density * params.nx * params.ny,
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            sharded.av_vels, single.av_vels, rtol=1e-5
        )


class TestStreamKernelSharded:
    """kernel='stream': the HBM-streaming manual-DMA kernel (the
    single-chip huge-grid record holder, ops.pallas_stream) composed with
    shard_map — K=8 steps per ring exchange on each shard's ±K ghost
    window (VERDICT round-3 item 5: the strongest kernels now have a
    multi-chip growth path; a 2-chip mesh can run grids whose single-chip
    form needs the stream tier)."""

    def _deck(self, iters):
        params = LBMParams(
            nx=128, ny=64, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        mask = np.zeros((params.ny, params.nx), dtype=bool)
        mask[0] = mask[-1] = True
        mask[30:34, 40:80] = True
        return params, mask

    @pytest.mark.parametrize("n_devices", [2, 4, 8])  # 8 -> ly=8, ty=K
    def test_matches_oracle(self, n_devices):
        params, mask = self._deck(48)
        obst = jnp.asarray(mask)
        f_ref, av_ref = fused.run_simulation(
            reference.initial_state(params), obst, params, n_iters=48
        )
        f_s, av_s = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=n_devices, kernel="stream", interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(f_s), np.asarray(f_ref), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(av_s), np.asarray(av_ref), rtol=5e-4
        )

    def test_sub_k_tail_uses_one_step_kernel(self):
        """52 = 3*16 + 4: the scan covers 48 steps, the last 4 run the
        1-step jnp local step — per-step av history stays complete."""
        params, mask = self._deck(52)
        obst = jnp.asarray(mask)
        f_ref, av_ref = fused.run_simulation(
            reference.initial_state(params), obst, params, n_iters=52
        )
        f_s, av_s = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=2, kernel="stream", interpret=True,
        )
        assert av_s.shape == (52,)
        np.testing.assert_allclose(
            np.asarray(av_s), np.asarray(av_ref), rtol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(f_s), np.asarray(f_ref), rtol=1e-5, atol=1e-7
        )

    def test_bad_ca_steps_raises(self):
        params, mask = self._deck(16)
        with pytest.raises(ValueError, match="K=8 steps per"):
            halo.run_sharded(
                reference.initial_state(params), jnp.asarray(mask), params,
                n_devices=2, kernel="stream", ca_steps=4, interpret=True,
            )

    def test_explicit_ca_steps_8_equals_default(self):
        """ca_steps=8 is documented as valid with kernel='stream' (it IS
        the schedule) — the thin-slab gate must not reject it where the
        identical default-ca_steps run passes (round-4 review finding:
        ly=8 slabs tripped the jnp-CA 2K check on the explicit spelling)."""
        params, mask = self._deck(16)  # ny=64 / 8 devices -> ly=8 < 2K
        obst = jnp.asarray(mask)
        f_d, av_d = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=8, kernel="stream", interpret=True,
        )
        f_e, av_e = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=8, kernel="stream", ca_steps=8, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(f_e), np.asarray(f_d))
        np.testing.assert_array_equal(np.asarray(av_e), np.asarray(av_d))

    def test_compiled_off_tpu_fails_actionably(self):
        """A compiled (non-interpret) stream-kernel run off-TPU must die
        with the actionable ValueError the pallas branch gets, not an
        opaque Mosaic lowering error (round-4 review finding)."""
        params, mask = self._deck(16)
        with pytest.raises(ValueError, match="stream kernel"):
            halo.prepare_sharded(
                params, 16, n_devices=2, kernel="stream",
            )

    def test_2d_mesh_untileable_block_raises(self):
        """2-D torus + stream is supported since round 5
        (tests/test_stream_2d.py), but a block whose lx isn't
        lane-aligned must still die actionably, not lower garbage."""
        params, mask = self._deck(16)
        with pytest.raises(ValueError, match="not tileable for the 2-D"):
            halo.run_sharded_2d(
                reference.initial_state(params), jnp.asarray(mask), params,
                (2, 2), kernel="stream", interpret=True,
            )

    def test_debug_falls_back_with_densities(self):
        """collect_density on the stream kernel falls back to the jnp CA
        path (K=8) — the debug stream works on every shard-kernel choice."""
        params, mask = self._deck(16)
        obst = jnp.asarray(mask)
        _, _, dens_ref = fused.run_simulation(
            reference.initial_state(params), obst, params, n_iters=16,
            collect_density=True,
        )
        _, av, dens = halo.run_sharded(
            reference.initial_state(params), obst, params,
            n_devices=2, kernel="stream", interpret=True,
            collect_density=True,
        )
        assert dens.shape == (16,)
        np.testing.assert_allclose(
            np.asarray(dens), np.asarray(dens_ref), rtol=1e-4
        )

    def test_model_shard_kernel_stream(self):
        """Simulation.run(devices=N, shard_kernel='stream') — the
        user-facing composition (CLI --shard-kernel stream)."""
        from advanced_hpc_lbm_tpu.models.d2q9_bgk import Simulation
        from advanced_hpc_lbm_tpu.parallel import halo as _halo

        params, mask = self._deck(16)
        # the model path doesn't expose interpret; route through a
        # monkeypatch-free interpret shim is overkill — patch prepare
        import advanced_hpc_lbm_tpu.ops.pallas_stream as ps

        orig = ps.window_ca_steps
        orig_gate = _halo._stream_compiled_supported
        try:
            ps.window_ca_steps = lambda w, m, p, *, interpret=False: orig(
                w, m, p, interpret=True
            )
            # the platform gate would (correctly) reject a compiled
            # stream run on this CPU host; the shim above interprets
            _halo._stream_compiled_supported = lambda ly, nx: True
            sharded = Simulation(params, mask, backend="fused").run(
                n_iters=16, devices=2, shard_kernel="stream"
            )
        finally:
            ps.window_ca_steps = orig
            _halo._stream_compiled_supported = orig_gate
        single = Simulation(params, mask, backend="fused").run(n_iters=16)
        np.testing.assert_allclose(
            sharded.av_vels, single.av_vels, rtol=5e-4
        )
