"""Capture a jax.profiler trace of the 1024^2 Pallas step (+ summary).

The reference ships captured profiling artifacts (gprof flat profiles,
an Intel Advisor project — SURVEY.md section 2 rows 27-28); this is the
TPU equivalent: a committed XPlane/Perfetto trace of the production
kernel plus an extracted per-op time breakdown.

Writes:
  runs/trace_1024/...               the raw jax.profiler artifacts
  runs/trace_1024_summary.md        per-op duration table (the flat profile)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

STEPS = 50
OUT_DIR = "runs/trace_1024"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import fused, pallas_step, reference
    from advanced_hpc_lbm_tpu.params import LBMParams
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    n = 1024
    params = LBMParams(n, n, STEPS, 10, 0.1, 0.01, 1.85)
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    obstacles = jnp.asarray(mask)
    runner = jax.jit(
        lambda f, o: fused.run_simulation(
            f, o, params, n_iters=STEPS, step_fn=pallas_step.pallas_fused_step
        )
    )
    # warm OUTSIDE the trace so the capture is pure steady-state compute
    f, av = runner(reference.initial_state(params), obstacles)
    np.asarray(av)

    with jax.profiler.trace(OUT_DIR):
        f, av = runner(reference.initial_state(params), obstacles)
        np.asarray(av)
        f.block_until_ready()

    # ---- flat profile from the Perfetto trace ----
    traces = sorted(glob.glob(os.path.join(
        OUT_DIR, "plugins/profile/*/*.trace.json.gz")))
    assert traces, "no trace captured"
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # the device plane: process named "/device:TPU:0", thread "XLA Ops"
    dev_pid = next(
        ev["pid"] for ev in events
        if ev.get("ph") == "M" and ev.get("name") == "process_name"
        and "TPU" in ev.get("args", {}).get("name", "")
    )
    ops_tid = next(
        ev["tid"] for ev in events
        if ev.get("ph") == "M" and ev.get("name") == "thread_name"
        and ev.get("pid") == dev_pid
        and ev.get("args", {}).get("name") == "XLA Ops"
    )
    durs = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for ev in events:
        if (
            ev.get("ph") == "X" and "dur" in ev
            and ev.get("pid") == dev_pid and ev.get("tid") == ops_tid
        ):
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
            counts[name] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    total = sum(durs.values())
    lines = [
        f"# Flat device profile — 1024x1024, {STEPS} warm pallas steps "
        "(jax.profiler trace, /device:TPU:0 'XLA Ops' plane)",
        "",
        f"Trace: `{traces[-1]}`  — the TPU analogue of the reference's "
        "gprof flat profiles (profile.txt / profile1.txt) and Advisor "
        f"survey (e000/).  Total device op time {total/1e3:.2f} ms for "
        f"{STEPS} steps.",
        "",
        "| device op | calls | total ms | % | per-call us |",
        "|---|---|---|---|---|",
    ]
    for name, d in rows[:15]:
        c = counts[name]
        lines.append(
            f"| {name[:60]} | {c} | {d/1e3:.2f} | {100*d/total:.1f} | "
            f"{d/c:.1f} |"
        )
    summary = "\n".join(lines) + "\n"
    with open("runs/trace_1024_summary.md", "w") as fh:
        fh.write(summary)
    print(summary)
    sizes = {p: os.path.getsize(p) for p in glob.glob(
        os.path.join(OUT_DIR, "plugins/profile/*/*"))}
    for p, s in sizes.items():
        print(f"{s/1e6:8.2f} MB  {p}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
