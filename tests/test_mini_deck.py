"""Self-contained smoke deck: the repo's own 64x64 deck + oracle golden,
runnable without the reference mount."""

import os

import numpy as np
import pytest

from advanced_hpc_lbm_tpu.models.d2q9_bgk import Simulation
from advanced_hpc_lbm_tpu.utils import io as lbm_io

DECKS = os.path.join(os.path.dirname(__file__), "..", "decks")


@pytest.fixture(scope="module")
def mini():
    return (
        os.path.join(DECKS, "mini_64x64.params"),
        os.path.join(DECKS, "mini_64x64.obstacles.dat"),
        os.path.join(DECKS, "mini_64x64.golden_av_vels.dat"),
    )


def test_fused_matches_pipeline_golden(mini):
    """The production fused path must reproduce the pipeline-oracle golden
    shipped with the repo (bitwise-near; both are jnp on CPU here)."""
    params_f, obst_f, golden_f = mini
    sim = Simulation.from_decks(params_f, obst_f, backend="fused")
    res = sim.run()
    golden = lbm_io.read_av_vels(golden_f)
    diff = golden - res.av_vels.astype(np.float64)
    pct = 100.0 * diff / (golden - diff)
    assert np.max(np.abs(pct)) < 0.01


def test_deck_loads(mini):
    params_f, obst_f, _ = mini
    p = lbm_io.load_params(params_f)
    assert (p.nx, p.ny, p.max_iters) == (64, 64, 500)
    mask = lbm_io.load_obstacles(obst_f, p)
    assert mask[0].all() and mask[:, 0].all()
    assert mask[20:44, 21].all()  # the plate
