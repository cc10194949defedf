"""Pallas kernel correctness vs the jnp oracle (interpret mode on CPU).

The kernel itself runs on TPU; interpret mode executes the same kernel
logic on CPU, so these tests validate the tiling/halo/forcing logic
hermetically.  Hardware equivalence is covered by the golden deck test in
test_golden.py when run on a TPU host.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.ops import fused, pallas_step, reference
from advanced_hpc_lbm_tpu.params import LBMParams


def make_case(ny, nx, seed=0, box=True):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=4, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(seed)
    mask = np.zeros((ny, nx), dtype=bool)
    if box:
        mask[0] = mask[-1] = True
        mask[ny // 2 : ny // 2 + 2, nx // 3 : nx // 2] = True
        for _ in range(6):
            mask[rng.randint(1, ny - 1), rng.randint(0, nx)] = True
    f0 = np.asarray(reference.initial_state(params)) * rng.uniform(
        0.8, 1.2, (9, ny, nx)
    ).astype(np.float32)
    return params, jnp.asarray(mask), jnp.asarray(f0)


def run_pallas(f, obst, params, steps=1):
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    obst8 = pallas_step.prepare_obstacles(obst)
    avs = []
    for _ in range(steps):
        f, av = pallas_step.pallas_fused_step(
            f, obst8, n_fluid, params, interpret=True
        )
        avs.append(av)
    return f, jnp.stack(avs)


def run_fused(f, obst, params, steps=1):
    n_fluid = jnp.sum(~obst).astype(jnp.float32)
    avs = []
    for _ in range(steps):
        f, av = fused.fused_step(f, obst, n_fluid, params)
        avs.append(av)
    return f, jnp.stack(avs)


class TestPallasEquivalence:
    @pytest.mark.parametrize(
        "ny,nx",
        [(32, 128), (64, 128), (64, 256)],  # 1..4 tiles at ty in {16,32}
    )
    def test_single_step_matches_fused(self, ny, nx):
        params, obst, f0 = make_case(ny, nx)
        fa, ava = run_fused(f0, obst, params)
        fb, avb = run_pallas(f0, obst, params)
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
        )
        # the kernel's reduction uses pre-collision moments (exactly equal
        # in real arithmetic, ~1e-7 rel in fp32)
        np.testing.assert_allclose(
            np.asarray(avb), np.asarray(ava), rtol=1e-5
        )

    def test_multi_step_trajectory(self):
        """Several steps catch stale parked-halo-row bugs: tile i's top
        halo must be the PREVIOUS step's values, refreshed per call."""
        params, obst, f0 = make_case(32, 128, seed=3)
        fa, ava = run_fused(f0, obst, params, steps=5)
        fb, avb = run_pallas(f0, obst, params, steps=5)
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=1e-4)

    def test_forcing_row_applied_once(self):
        """The forcing row ny-2 lives in the last tile; the masked in-place
        update must fire exactly there (wrong tiling would double-apply or
        skip it)."""
        params, obst, f0 = make_case(32, 128, box=False)  # no obstacles
        fa, _ = run_fused(f0, obst, params)
        fb, _ = run_pallas(f0, obst, params)
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
        )
        # and the step did something on that row's neighborhood
        assert not np.allclose(np.asarray(fb[1, -2]), np.asarray(f0[1, -2]))

    def test_periodic_wrap_rows(self):
        """Mass crossing the y boundary: a blob near row 0 streams into
        row ny-1 (tile 0's wrap halo) and vice versa."""
        params, obst, f0 = make_case(32, 128, box=False)
        f0 = np.array(f0)  # writable copy
        f0[4, 0, :] += 0.5  # south-moving mass in row 0 -> lands in ny-1
        f0[2, -1, :] += 0.25  # north-moving mass in row ny-1 -> lands in 0
        f0 = jnp.asarray(f0)
        fa, _ = run_fused(f0, obst, params)
        fb, _ = run_pallas(f0, obst, params)
        # larger injected mass -> larger values; allow ~1 ulp of fp32 slack
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
        )

    def test_minimum_grid_single_tile(self):
        """ny=8 is the smallest tileable grid: one tile whose wrap operand
        aliases its own main block and whose bottom halo wraps to row 0."""
        params, obst, f0 = make_case(8, 128)
        fa, ava = run_fused(f0, obst, params)
        fb, avb = run_pallas(f0, obst, params)
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(avb), np.asarray(ava), rtol=1e-4)

    def test_untileable_grid_raises(self):
        params, obst, f0 = make_case(32, 100)
        n_fluid = jnp.sum(~obst).astype(jnp.float32)
        with pytest.raises(ValueError, match="not tileable"):
            pallas_step.pallas_fused_step(f0, obst, n_fluid, params)

    def test_supported_shapes(self):
        assert pallas_step._pick_tile_rows(1024, 1024) in (16, 32, 64)
        assert pallas_step._pick_tile_rows(128, 128) is not None
        assert pallas_step._pick_tile_rows(30, 128) is None


class TestTileRowPicker:
    def test_respects_vmem_budget(self):
        # with the raised scoped-VMEM limit, the 64 MB buffer budget holds
        # (4 double-buffered in+out blocks of 36*ty*nx bytes)
        ty = pallas_step._pick_tile_rows(4096, 4096)
        assert ty is not None
        assert 4 * 36 * ty * 4096 <= 64 * 1024 * 1024
        # and huge lane widths still shrink the slab rather than OOM
        assert pallas_step._pick_tile_rows(8192, 8192) == 32

    def test_env_override(self):
        os.environ["LBM_PALLAS_TY"] = "16"
        try:
            assert pallas_step._pick_tile_rows(64, 128) == 16
        finally:
            del os.environ["LBM_PALLAS_TY"]
