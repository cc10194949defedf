"""Arbitrary-shape decks on the streaming kernel (VERDICT round-4 item 4).

The reference's C loops handle any nx/ny (d2q9-bgk.c:2736-2747); every
Mosaic tier here needs nx % 128 == 0 / ny % 8 == 0.  ops.pallas_stream's
ghost-padded window embedding (run_any) closes the asymmetry: the true
grid rides inside a lane-aligned window whose ghosts carry periodic wrap
data and are rebuilt from the exact own region between K=8-step passes.
Oracle equality in interpret mode over fuzzed odd shapes validates the
row-image pad scheme, the column-garbage containment (depth K-1 < ghost
width), the +4 reduction-exclude flags, and the ghost rebuild.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_hpc_lbm_tpu.models.d2q9_bgk import Simulation
from advanced_hpc_lbm_tpu.ops import fused, pallas_stream, reference
from advanced_hpc_lbm_tpu.params import LBMParams


def _deck(ny, nx, iters, seed=7):
    params = LBMParams(
        nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(seed)
    mask = rng.rand(ny, nx) < 0.05
    mask[0] = True
    mask[ny - 2] = False  # keep the forcing row active
    return params, mask


def _oracle(params, mask, iters):
    f_ref, av_ref = fused.run_simulation(
        reference.initial_state(params), jnp.asarray(mask), params,
        n_iters=iters,
    )
    return np.asarray(f_ref), np.asarray(av_ref)


class TestGeometry:
    def test_aligned_is_degenerate(self):
        # an aligned grid still embeds (p=0); gr stays >= K
        ly, p, wnx, gl, gr = pallas_stream.any_geometry(64, 256)
        assert (ly, p) == (64, 0)
        assert wnx % 128 == 0 and gl == pallas_stream.K and gr >= pallas_stream.K

    @pytest.mark.parametrize(
        "ny,nx", [(17, 140), (23, 257), (100, 100), (1000, 1000), (16, 112)]
    )
    def test_supported_odd_shapes(self, ny, nx):
        assert pallas_stream.window_supported_any(ny, nx)
        ly, p, wnx, gl, gr = pallas_stream.any_geometry(ny, nx)
        assert ly % 8 == 0 and wnx % 128 == 0
        assert p == ly - ny and gl >= pallas_stream.K and gr >= pallas_stream.K
        assert ny >= p + pallas_stream.K and nx >= gr

    def test_too_small_rejected(self):
        assert not pallas_stream.window_supported_any(8, 128)   # ny < 2K
        assert not pallas_stream.window_supported_any(100, 30)  # nx < gr

    def test_supported_any_gates_platform(self):
        # conftest forces CPU: the TPU-gated form must say no even for
        # geometrically fine shapes
        assert not pallas_stream.supported_any(100, 1000)


@pytest.mark.parametrize(
    "ny,nx,iters",
    [
        (17, 140, 16),    # odd both axes, minimum-ish rows
        (23, 257, 16),    # prime-ish
        (100, 100, 16),   # the classic odd user deck, small
        (40, 130, 19),    # sub-K tail (19 = 2*8 + 3)
        (64, 256, 16),    # aligned degenerate case (p=0)
    ],
)
def test_run_any_matches_oracle(ny, nx, iters):
    params, mask = _deck(ny, nx, iters)
    f_ref, av_ref = _oracle(params, mask, iters)
    f_a, av_a = pallas_stream.run_any(
        reference.initial_state(params), jnp.asarray(mask), params,
        n_iters=iters, interpret=True,
    )
    assert av_a.shape == (iters,)
    np.testing.assert_allclose(np.asarray(f_a), f_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(av_a), av_ref, rtol=5e-4)


def test_run_any_forcing_row_obstacles():
    """Partial obstacles ON the forcing row: the +2/+1 encoding and its
    ghost images must compose (m==3 decode) across the wrap columns."""
    params, _ = _deck(20, 200, 16)
    mask = np.zeros((20, 200), dtype=bool)
    mask[0] = True
    mask[18, 37:101] = True  # forcing row ny-2, asymmetric blockage
    f_ref, av_ref = _oracle(params, mask, 16)
    f_a, av_a = pallas_stream.run_any(
        reference.initial_state(params), jnp.asarray(mask), params,
        n_iters=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(f_a), f_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(av_a), av_ref, rtol=5e-4)


def test_mask_window_excludes_pads_only():
    params, mask = _deck(17, 140, 8)
    enc = pallas_stream.prepare_masks_any(jnp.asarray(mask), params)
    ly, p, wnx, gl, gr = pallas_stream.any_geometry(17, 140)
    K = pallas_stream.K
    assert enc.shape == (ly + 2 * K, wnx)
    own = np.asarray(enc)[K : K + 17, gl : gl + 140]
    assert (own < 4.0).all()  # true cells never excluded
    outside = np.asarray(enc).copy()
    outside[K : K + 17, gl : gl + 140] = 4.0
    assert (outside >= 4.0).all()  # everything else excluded


def test_auto_routes_odd_deck_to_stream(monkeypatch):
    """The auto ladder must route a TPU odd deck to the stream tier, not
    silently to fused (the platform probe is monkeypatched — CPU here)."""
    monkeypatch.setattr(
        pallas_stream, "supported_any",
        lambda ny, nx: pallas_stream.window_supported_any(ny, nx),
    )
    params, mask = _deck(1000, 1000, 4)
    sim = Simulation(params, mask, backend="auto")
    assert sim.backend == "stream"


def test_explicit_stream_odd_deck_off_tpu_raises_actionably():
    """backend='stream' with an odd deck off-TPU must die with the
    actionable shape message, not lower Mosaic garbage."""
    params, mask = _deck(100, 100, 8)
    sim = Simulation(params, mask, backend="stream")
    with pytest.raises(ValueError, match="arbitrary-shape"):
        sim.run()
