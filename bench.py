"""Headline benchmark: GLUPS at 1024x1024 on the available accelerator.

Prints ONE JSON line:
  {"metric": "GLUPS_1024x1024", "value": N, "unit": "GLUPS", "vs_baseline": N}

Baseline: the reference's best published 1024x1024 number — fused
timestep_new2, -Ofast, single Broadwell core: 20000 iters in 574.370 s
= 36.5 MLUPS (d2q9-bgk_1.out; BASELINE.md).  vs_baseline = ours / 0.0365.

Usage: python bench.py [--iters N] [--size NxN] [--backend fused|pallas]
       python bench.py --matrix       # multi-size regression gate:
         runs the 512^2-8192^2 curve in ONE process and compares each size
         against the recorded BENCH.md value with a tolerance band — one
         pass/fail JSON line per size, nonzero exit on any regression.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_GLUPS = 0.0365  # reference optimized serial, 1024^2 (BASELINE.md)

# Transient-outage resilience for the FIRST device touch: the axon TPU
# relay can be down for ~1-3 minutes (CLAUDE.md "wedged relay"), and jax
# does NOT cache a loud backend-init failure (xla_bridge.backends() leaves
# _backends empty on raise), so an in-process retry re-attempts the
# factory.  Round 3's driver capture was lost to a single unretried
# failure (VERDICT round-3 item 1) — this is the fix.
INIT_RETRY_ATTEMPTS = 5
INIT_RETRY_BACKOFF_S = 75.0


def _is_backend_init_error(e: BaseException) -> bool:
    msg = str(e)
    return isinstance(e, RuntimeError) and (
        "Unable to initialize backend" in msg or "UNAVAILABLE" in msg
    )


def wait_for_device(
    attempts: int = INIT_RETRY_ATTEMPTS,
    backoff_s: float = INIT_RETRY_BACKOFF_S,
    *,
    _devices_fn=None,
    _sleep=time.sleep,
):
    """Probe the accelerator backend with bounded retries before any timed
    work.  Returns the device list; raises the last init error once the
    budget is exhausted, and immediately on any non-init error.  Logs each
    retry to stderr — stdout keeps the one-JSON-line contract."""
    if _devices_fn is None:
        def _devices_fn():
            import jax

            return jax.devices()

    last: BaseException | None = None
    for attempt in range(1, attempts + 1):
        try:
            return _devices_fn()
        except RuntimeError as e:
            if not _is_backend_init_error(e):
                raise
            last = e
            if attempt == attempts:
                break
            print(
                f"# backend init failed (attempt {attempt}/{attempts}): "
                f"{str(e)[:200]}; retrying in {backoff_s:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            _sleep(backoff_s)
    assert last is not None
    raise last

# --matrix regression gate: recorded round-2 GLUPS per size (BENCH.md
# headline table, min-of-repeats, long amortized calls) with the iteration
# counts those numbers were measured at.  The tolerance band absorbs
# shared-chip noise (additive, so min-of-repeats is stable to ~10%) while
# still catching a real kernel regression.
MATRIX = [
    # (size, iters, recorded GLUPS)
    ("512x512", 20000, 17.5),
    ("1024x1024", 20000, 28.25),
    ("2048x2048", 4000, 20.2),
    ("4096x4096", 1200, 18.15),
    ("8192x8192", 400, 16.46),  # stream in-place (round 3); pallask read 16.06
]
# Opt-in huge-grid tier (--matrix-huge): guards the round-3 flagship
# capability — the in-place/padded-native stream kernel at sizes where
# every other tier OOMs (VERDICT round-3 item 3).  Few iters (the runs
# are seconds; the value is "still compiles + still lands on the stream
# tier + within band", not a fresh headline).  Iter counts are K=8
# multiples — the padded-native tier (16384^2+) has no 1-step tail.
MATRIX_HUGE = [
    ("12288x12288", 240, 15.86),  # stream in-place jit (BENCH.md round 3)
    ("16384x16384", 96, 14.77),   # stream padded-native tier
]
MATRIX_TOLERANCE = 0.15  # fail below recorded * (1 - tolerance)


def build_deck(nx: int, ny: int, max_iters: int):
    from advanced_hpc_lbm_tpu.params import LBMParams

    params = LBMParams(
        nx=nx, ny=ny, max_iters=max_iters, reynolds_dim=10,
        density=0.1, accel=0.01, omega=1.85,
    )
    # the reference 1024x1024 geometry: closed box + interior vertical wall
    # at x=341 (obstacles_1024x1024.dat; SURVEY.md section 2)
    mask = np.zeros((ny, nx), dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    mask[: ny // 2, min(nx - 1, nx // 3)] = True
    return params, mask


def resolve_backend(backend: str, ny: int, nx: int) -> str:
    if backend != "best":
        return backend
    try:
        from advanced_hpc_lbm_tpu.ops import (
            pallas_k, pallas_step, pallas_stream, resident,
        )

        if resident.supported(ny, nx):
            return "resident"
        from advanced_hpc_lbm_tpu.models.d2q9_bgk import _device_hbm_bytes

        hbm = _device_hbm_bytes()
        if (
            ny * nx >= 8192 * 8192
            and pallas_stream.supported(ny, nx)
            and (
                hbm is None
                or pallas_stream.padded_tier_bytes(ny, nx) <= 0.9 * hbm
            )
        ):
            # the in-place streaming kernel is the measured ≥8192² winner
            # (16.46 vs pallask 15.97 GLUPS interleaved) — mirrors the
            # model's auto selection incl. its padded-tier HBM gate
            return "stream"
        if (
            ny * nx > 1024 * 1024
            and pallas_step.supported(ny, nx)
            and pallas_k.best_k(ny, nx) is not None
        ):
            return "pallask"
        if pallas_step.supported(ny, nx):
            return "pallas"
    except (ImportError, ValueError) as e:
        # fall back, but never silently: a broken Pallas import would
        # otherwise make the gate measure the ~100x-slower fused path with
        # no diagnostic (VERDICT round-3 weak #3).  Anything else
        # propagates — the supported()/best_k probes catch their own
        # device errors, so an unexpected exception here is a real bug.
        print(
            f"# resolve_backend: auto-selection failed "
            f"({type(e).__name__}: {e}); falling back to 'fused'",
            file=sys.stderr,
            flush=True,
        )
    return "fused"


def measure(size: str, iters: int, backend: str, repeats: int):
    """Warm + time one (size, iters, backend) config in this process.
    Returns (glups_best, glups_median, backend, times)."""
    import jax

    from advanced_hpc_lbm_tpu.ops import fused, reference

    nx, ny = (int(v) for v in size.split("x"))
    params, mask = build_deck(nx, ny, iters)
    import jax.numpy as jnp

    obstacles = jnp.asarray(mask)
    backend = resolve_backend(backend, ny, nx)

    if backend == "resident":
        from advanced_hpc_lbm_tpu.ops import resident

        runner = jax.jit(
            lambda f, o, n=iters: resident.resident_run(f, o, params, n_iters=n),
            donate_argnums=0,
        )
    elif backend == "pallask":
        from advanced_hpc_lbm_tpu.ops import pallas_k

        kk = pallas_k.best_k(ny, nx)
        runner = jax.jit(
            lambda f, o, n=iters: pallas_k.run(f, o, params, n_iters=n, k=kk),
            donate_argnums=0,
        )
    elif backend == "stream":
        from advanced_hpc_lbm_tpu.models.d2q9_bgk import _device_hbm_bytes
        from advanced_hpc_lbm_tpu.ops import pallas_stream

        hbm = _device_hbm_bytes()
        state = 9 * ny * nx * 4
        if hbm is not None and 2 * state + ny * nx * 4 > 0.9 * hbm:
            # 16384²+: padded-native tier (see the model's stream branch)
            padded = pallas_stream.make_padded_runner(
                obstacles, params, n_iters=iters
            )

            def runner(f, o):
                f.delete()
                return padded()
        else:
            # donate f0 like the model's runner does (ADVICE round 3):
            # without it the undonated input stays alive beside the padded
            # carry for the whole scan — ~2x state where the shipped
            # backend holds ~1x, narrowing headroom at 12288^2
            runner = jax.jit(
                lambda f, o, n=iters: pallas_stream.run(
                    f, o, params, n_iters=n, inplace=True
                ),
                donate_argnums=0,
            )
    elif backend == "pallas2":
        from advanced_hpc_lbm_tpu.ops import pallas_multi

        runner = jax.jit(
            lambda f, o, n=iters: pallas_multi.run(f, o, params, n_iters=n),
            donate_argnums=0,
        )
    else:
        if backend == "pallas":
            from advanced_hpc_lbm_tpu.ops import pallas_step

            step_fn = pallas_step.pallas_fused_step
        else:
            step_fn = fused.fused_step

        runner = jax.jit(
            lambda f, o, n=iters: fused.run_simulation(
                f, o, params, n_iters=n, step_fn=step_fn
            ),
            donate_argnums=0,
        )

    def run():
        """One full timed run: fresh initial state, execute, and
        materialize the av history to host — exactly what a real
        simulation does (the reference keeps av_vels on the host,
        d2q9-bgk.c:182).  Host materialization also defeats any
        async-dispatch underreporting."""
        f0 = reference.initial_state(params)
        f_final, av = runner(f0, obstacles)
        av_host = np.asarray(av)
        if hasattr(f_final, "block_until_ready"):
            f_final.block_until_ready()  # padded tier returns host numpy
        return av_host

    # warm with the EXACT program that will be timed (a different iteration
    # count is a different scan length = a different executable)
    run()
    times = []
    for _ in range(repeats):
        tic = time.perf_counter()
        av_host = run()
        times.append(time.perf_counter() - tic)
    # the shared chip's window noise is strictly additive (±30-100%,
    # BENCH.md), so the minimum is the least-contaminated estimate of the
    # kernel's actual speed — standard practice for timing on shared
    # hardware; the median is reported alongside on stderr
    assert np.all(np.isfinite(av_host)), "NaN in av_vels during bench"
    assert av_host.shape[0] == iters
    best = min(times)
    median = sorted(times)[len(times) // 2]
    cells = nx * ny
    return cells * iters / best / 1e9, cells * iters / median / 1e9, backend, times


def run_matrix(repeats: int, include_huge: bool = False) -> int:
    """The multi-size regression gate (VERDICT round-2 item 6): every size
    of the recorded curve, one process, pass/fail vs the tolerance band.
    ``include_huge`` appends the 12288^2/16384^2 stream-tier entries
    (VERDICT round-3 item 3)."""
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    entries = MATRIX + (MATRIX_HUGE if include_huge else [])
    failures = 0
    for size, iters, recorded in entries:
        try:
            glups, med, backend, _ = measure(size, iters, "best", repeats)
        except Exception as e:  # a size that stops running IS a regression
            print(
                json.dumps(
                    {
                        "metric": f"GLUPS_{size}",
                        "value": None,
                        "unit": "GLUPS",
                        "recorded": recorded,
                        "pass": False,
                        "error": f"{type(e).__name__}: {e}"[:200],
                    }
                ),
                flush=True,
            )
            failures += 1
            continue
        floor = recorded * (1.0 - MATRIX_TOLERANCE)
        ok = glups >= floor
        # on a TPU "best" must never land on the XLA-fused fallback — that
        # means a kernel tier silently stopped resolving (~100x slower)
        resolved_wrong = on_tpu and backend == "fused"
        failures += not ok or resolved_wrong
        line = {
            "metric": f"GLUPS_{size}",
            "value": round(glups, 4),
            "unit": "GLUPS",
            "recorded": recorded,
            "floor": round(floor, 2),
            "backend": backend,
            "pass": bool(ok and not resolved_wrong),
        }
        if resolved_wrong:
            line["error"] = "'best' resolved to 'fused' on a TPU device"
        print(json.dumps(line), flush=True)
    print(
        f"# matrix: {len(entries) - failures}/{len(entries)} sizes within "
        f"{MATRIX_TOLERANCE:.0%} of recorded "
        f"(device={jax.devices()[0].device_kind})",
        file=sys.stderr,
    )
    return 1 if failures else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    # full reference deck length (input_1024x1024.params): each runner call
    # through the device tunnel pays a ~58 ms fixed dispatch/round-trip cost
    # (measured by the 48/480/4800-step interleaved probe, BENCH.md), so
    # short timed calls under-report the kernel by up to 2x — 20000 steps
    # amortizes it to ~3%
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--size", default="1024x1024")
    ap.add_argument(
        "--backend",
        default="best",
        choices=["best", "fused", "pallas", "pallas2", "pallask", "resident",
                 "stream"],
    )
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--matrix", action="store_true",
        help="multi-size regression gate: run the recorded 512^2-8192^2 "
             "curve and pass/fail each size against BENCH.md values",
    )
    ap.add_argument(
        "--matrix-huge", action="store_true",
        help="with --matrix: also run the 12288^2/16384^2 in-place stream "
             "tiers (minutes of extra compile on a cold cache)",
    )
    ap.add_argument(
        "--warmup",
        type=int,
        default=None,
        help="deprecated; warmup always runs the timed program once",
    )
    args = ap.parse_args(argv)

    from advanced_hpc_lbm_tpu.utils import cache

    cache.enable()
    # first device touch, behind the bounded-retry probe — a transient
    # relay outage becomes a ~minutes delay instead of a lost artifact
    wait_for_device()

    if args.matrix:
        return run_matrix(min(args.repeats, 3), include_huge=args.matrix_huge)

    import jax

    glups, glups_med, backend, times = measure(
        args.size, args.iters, args.backend, args.repeats
    )
    print(
        json.dumps(
            {
                "metric": f"GLUPS_{args.size}",
                "value": round(glups, 4),
                "unit": "GLUPS",
                "vs_baseline": round(glups / BASELINE_GLUPS, 1),
                # stability fields (VERDICT round-4 item 7): `value` stays
                # the min-of-repeats headline, but round-over-round drift
                # is only attributable with the spread alongside it
                "best": round(glups, 4),
                "median": round(glups_med, 4),
                "repeats": len(times),
            }
        )
    )
    print(
        f"# backend={backend} iters={args.iters} best={min(times):.3f}s "
        f"median={sorted(times)[len(times) // 2]:.3f}s ({glups_med:.2f} "
        f"GLUPS) device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
