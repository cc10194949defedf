#!/usr/bin/env python
"""Build a simulation from in-memory arrays (no deck files): flow past a
square cylinder, then plot the wake.

    python examples/custom_geometry.py
"""

import numpy as np

from advanced_hpc_lbm_tpu import LBMParams, Simulation
from advanced_hpc_lbm_tpu.utils import viz

params = LBMParams(
    nx=256, ny=128, max_iters=4000, reynolds_dim=16,
    density=0.1, accel=0.005, omega=1.9,
)

# channel walls + a square cylinder in the stream
mask = np.zeros((params.ny, params.nx), dtype=bool)
mask[0, :] = mask[-1, :] = True
mask[48:80, 48:80] = True

sim = Simulation(params, mask, backend="auto")
result = sim.run(check_finite=True)
print(f"backend={sim.backend}  Re={result.reynolds:.4f}")

fs, _ = result.write(".")
out = viz.plot_final_state(fs, "wake.png")
print(f"wake plot: {out}")
