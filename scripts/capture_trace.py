"""Capture jax.profiler traces of the production kernels (+ summaries).

The reference ships captured profiling artifacts (gprof flat profiles,
an Intel Advisor project — SURVEY.md section 2 rows 27-28); this is the
TPU equivalent: a committed XPlane/Perfetto trace of each production
kernel plus an extracted per-op time breakdown.

Usage: python scripts/capture_trace.py [1024 resident1024 pallask2048]

Writes, per config:
  runs/trace_<name>/...            the raw jax.profiler artifacts
  runs/trace_<name>_summary.md     per-op duration table (the flat profile)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np


def _deck(n):
    mask = np.zeros((n, n), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    return mask


def _make_runner(name, steps):
    import jax
    import jax.numpy as jnp

    from advanced_hpc_lbm_tpu.ops import fused, pallas_k, pallas_step, reference, resident
    from advanced_hpc_lbm_tpu.params import LBMParams

    if name == "1024":  # historical name: the round-2 1-step-kernel trace
        n = 1024
        params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
        fn = lambda f, o: fused.run_simulation(
            f, o, params, n_iters=steps, step_fn=pallas_step.pallas_fused_step
        )
        desc = f"{steps} warm 1-step pallas steps at 1024x1024"
    elif name == "resident1024":
        n = 1024
        params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
        fn = lambda f, o: resident.resident_run(f, o, params, n_iters=steps)
        desc = (
            f"one VMEM-resident whole-run kernel call, {steps} steps at "
            "1024x1024 (the flagship backend — a single closed_call)"
        )
    elif name == "pallask2048":
        n = 2048
        params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
        k = pallas_k.best_k(n, n) or 4
        fn = lambda f, o: pallas_k.run(f, o, params, n_iters=steps, k=k)
        desc = (
            f"{steps} steps via the liveness-lean K-step ghost-zone kernel "
            f"(K={k}) at 2048x2048 — {steps // k} HBM passes"
        )
    elif name == "stream4096":
        from advanced_hpc_lbm_tpu.ops import pallas_stream

        n = 4096
        params = LBMParams(n, n, steps, 10, 0.1, 0.01, 1.85)
        fn = lambda f, o: pallas_stream.run(f, o, params, n_iters=steps)
        desc = (
            f"{steps} steps via the manual-DMA streaming kernel (K=8, "
            f"ty={pallas_stream._pick_tile_rows(n, n)}) at 4096x4096 — "
            "for the stall-source comparison against pallask"
        )
    else:
        raise SystemExit(f"unknown config {name!r}")
    runner = jax.jit(fn)
    mask = jnp.asarray(_deck(n))
    f0 = lambda: reference.initial_state(params)
    return runner, f0, mask, desc


def capture(name: str, steps: int = 48) -> None:
    import jax

    out_dir = f"runs/trace_{name}"
    runner, f0, mask, desc = _make_runner(name, steps)
    # warm OUTSIDE the trace so the capture is pure steady-state compute
    f, av = runner(f0(), mask)
    np.asarray(av)

    with jax.profiler.trace(out_dir):
        f, av = runner(f0(), mask)
        np.asarray(av)
        f.block_until_ready()

    # ---- flat profile from the Perfetto trace ----
    traces = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
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
            nm = ev.get("name", "?")
            durs[nm] += ev["dur"]
            counts[nm] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    total = sum(durs.values())
    lines = [
        f"# Flat device profile — {desc} "
        "(jax.profiler trace, /device:TPU:0 'XLA Ops' plane)",
        "",
        f"Trace: `{traces[-1]}`  — the TPU analogue of the reference's "
        "gprof flat profiles (profile.txt / profile1.txt) and Advisor "
        f"survey (e000/).  Total device op time {total/1e3:.2f} ms for "
        f"{steps} steps ({total/steps:.1f} us/step).",
        "",
        "| device op | calls | total ms | % | per-call us |",
        "|---|---|---|---|---|",
    ]
    for nm, d in rows[:15]:
        c = counts[nm]
        lines.append(
            f"| {nm[:60]} | {c} | {d/1e3:.2f} | {100*d/total:.1f} | "
            f"{d/c:.1f} |"
        )
    summary = "\n".join(lines) + "\n"
    with open(f"runs/trace_{name}_summary.md", "w") as fh:
        fh.write(summary)
    print(summary)
    for p in glob.glob(os.path.join(out_dir, "plugins/profile/*/*")):
        print(f"{os.path.getsize(p)/1e6:8.2f} MB  {p}", file=sys.stderr)


def main(argv=None) -> int:
    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    names = (argv or sys.argv[1:]) or ["1024"]
    for name in names:
        capture(name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
