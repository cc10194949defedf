#!/usr/bin/env python
"""Multi-chip domain decomposition, runnable on a laptop.

Runs the same deck four ways on an 8-device mesh (virtual CPU devices
here; real chips in production — the code is identical):

  1-D ring         — row slabs, one halo row exchanged per step
  1-D ring, CA     — K=4 rows exchanged every 4 steps (comm-avoiding)
  CA + Mosaic      — the ±K window runs the Pallas CA kernel per shard
  stream kernel    — the HBM-streaming huge-grid kernel per shard, K=8
                     steps per exchange (the multi-chip growth path of
                     the >18432^2 single-chip tier)
  2-D torus        — rows AND columns sharded, two-phase corner-free exchange

    python examples/multichip.py
"""

import os

# 8 virtual devices BEFORE jax initializes (real TPUs: delete these lines)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from advanced_hpc_lbm_tpu import LBMParams
from advanced_hpc_lbm_tpu.ops import reference
from advanced_hpc_lbm_tpu.parallel import halo

params = LBMParams(
    nx=256, ny=128, max_iters=200, reynolds_dim=16,
    density=0.1, accel=0.005, omega=1.9,
)
mask = np.zeros((params.ny, params.nx), dtype=bool)
mask[0, :] = mask[-1, :] = True
mask[48:80, 48:80] = True
obstacles = jnp.asarray(mask)

runs = {
    "1-D ring (8 devices)": dict(n_devices=8),
    "1-D ring, comm-avoiding K=4": dict(n_devices=8, ca_steps=4),
    # the production composition: Mosaic CA window kernel per shard
    # (interpret=True emulates the TPU kernel on these CPU devices)
    "1-D ring, CA K=4 + Mosaic": dict(
        n_devices=8, ca_steps=4, kernel="pallas", interpret=True
    ),
    # the huge-grid composition: HBM-streaming manual-DMA kernel per
    # shard (pallas_stream.window_ca_steps), K=8 steps per exchange
    "1-D ring, stream kernel K=8": dict(
        n_devices=8, kernel="stream", interpret=True
    ),
}
results = {}
for name, kw in runs.items():
    f, av = halo.run_sharded(
        reference.initial_state(params), obstacles, params, **kw
    )
    results[name] = np.asarray(av)
    print(f"{name:32} av[last] = {results[name][-1]:.9E}")

f2, av2 = halo.run_sharded_2d(
    reference.initial_state(params), obstacles, params, (4, 2)
)
results["2-D torus 4x2"] = np.asarray(av2)
print(f"{'2-D torus 4x2':32} av[last] = {np.asarray(av2)[-1]:.9E}")

# the plain ring reduces post-collision moments, the CA/2-D paths
# pre-collision ones — identical physics, ~1e-3 relative fp difference at
# these early steps (DESIGN.md "The step, mathematically")
base = results["1-D ring (8 devices)"]
for name, av in results.items():
    assert np.allclose(av, base, rtol=3e-3), name
print("all decompositions agree ✓")
