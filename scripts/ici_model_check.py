"""Measured-vs-model hook for the multi-chip scaling table (VERDICT
round-4 item 6): time the sharded step on whatever devices exist and log
it next to the DESIGN.md "Predicted scaling from measured constants"
wire model, so the day real multi-chip hardware shows up the table is
checked automatically instead of staying a prediction.

Log-only by design: on this container the mesh is virtual (CPU) or a
ring of one (the single TPU), neither of which measures ICI — the
printed ``environment`` field says which regime the number came from.

Usage:
    python scripts/ici_model_check.py --cpu --devices 8 --size 1024
    python scripts/ici_model_check.py --devices 1 --size 1024   # real TPU

(--cpu forces the virtual host mesh even where JAX_PLATFORMS is pinned
at interpreter start, the same way tests/conftest.py does.)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# DESIGN.md "Predicted scaling from measured constants"
COMPUTE_NS_PER_CELL = 0.075   # per-shard Mosaic 1-step local kernel
ICI_BYTES_PER_S = 10e9        # deliberately conservative (10 GB/s)
HALO_PLANES = 3               # slim halos: 3 planes each way per boundary


def model_step_seconds(ny: int, nx: int, n_devices: int, ca_steps: int = 1):
    """The wire model: per-step compute + amortized exchange, assuming no
    overlap (an upper bound).  Returns (total_s, compute_s, wire_s)."""
    cells_per_chip = ny * nx / n_devices
    compute_s = cells_per_chip * COMPUTE_NS_PER_CELL * 1e-9
    wire_bytes = 2 * HALO_PLANES * nx * 4 * (1 if n_devices > 1 else 0)
    wire_s = wire_bytes / ICI_BYTES_PER_S / ca_steps
    return compute_s + wire_s, compute_s, wire_s


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--ca-steps", type=int, default=1)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the virtual CPU mesh (8 host devices unless XLA_FLAGS "
        "already sets a count) — needed where JAX_PLATFORMS is pinned at "
        "interpreter start and the env var is ignored",
    )
    args = ap.parse_args()

    if args.cpu:
        # jax may already be imported (sitecustomize) — that's fine: both
        # XLA_FLAGS and the platform config are read lazily at backend
        # init, which hasn't happened yet (same mechanism as conftest.py)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            n_virt = args.devices or 8
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virt}"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import reference
    from advanced_hpc_lbm_tpu.parallel import halo
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = args.devices or len(jax.devices())
    platform = jax.devices()[0].platform
    params = LBMParams(
        nx=args.size, ny=args.size, max_iters=args.iters, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    mask = np.zeros((params.ny, params.nx), dtype=bool)
    mask[0] = mask[-1] = True
    obst = jnp.asarray(mask)

    runner, sh = halo.prepare_sharded(
        params, args.iters, n_devices=n, kernel=args.kernel,
        ca_steps=args.ca_steps,
        interpret=(args.kernel in ("pallas", "stream") and platform != "tpu"),
    )
    # warm with the EXACT executable (same scan length), then time one
    # more invocation, materializing a real output inside the timed
    # region (CLAUDE.md: block_until_ready under-reports through the relay)
    f0 = reference.initial_state(params)
    out = halo.execute_sharded(runner, sh, f0, obst, params)
    np.asarray(out[1])
    t0 = time.perf_counter()
    out = halo.execute_sharded(runner, sh, f0, obst, params)
    av = np.asarray(out[1])
    dt = time.perf_counter() - t0
    assert np.isfinite(av).all()

    measured = dt / args.iters
    model, comp, wire = model_step_seconds(
        params.ny, params.nx, n, args.ca_steps
    )
    env = (
        "real multi-chip ICI" if platform == "tpu" and n > 1
        else "single TPU (ring of one; ppermute ~240us/step via tunnel)"
        if platform == "tpu"
        else "virtual CPU mesh (no ICI; compute model inapplicable)"
    )
    record = {
        "grid": f"{params.ny}x{params.nx}",
        "devices": n,
        "platform": platform,
        "kernel": args.kernel,
        "ca_steps": args.ca_steps,
        "measured_step_s": round(measured, 9),
        "model_step_s": round(model, 9),
        "model_compute_s": round(comp, 9),
        "model_wire_s": round(wire, 9),
        "measured_over_model": round(measured / model, 3),
        "environment": env,
        "authoritative": platform == "tpu" and n > 1,
    }
    print(json.dumps(record))
    if not record["authoritative"]:
        print(
            "# log-only: this environment cannot measure ICI — the model "
            "is falsified/confirmed only when 'authoritative' is true",
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
