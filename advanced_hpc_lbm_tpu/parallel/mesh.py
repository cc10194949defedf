"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_y_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the y (row) axis of the grid.

    The LBM stencil is 1-hop, so a 1-D ring decomposition along y gives each
    device two neighbors and rides ICI for the halo exchange — the TPU
    realization of the MPI row decomposition the reference left as a stub
    (d2q9-bgk.c:208).
    """
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.array(devs[:n]), axis_names=("y",))
