"""Re-capture runs/*.out with warm-executable semantics + array variance.

Runs each reference deck through the CLI (which AOT-compiles in Init, so
Compute measures compute — d2q9-bgk.c:177-206 semantics), saves the logs
to runs/lbm_tpu_<deck>.out, then repeats the 1024x1024 deck N times in one
process to capture run-to-run variance (the reference's array-job evidence,
job_submit_array:11, d2q9-bgk_{1..10}.out).

Usage: python scripts/capture_runs.py [--decks ...] [--variance-runs 5]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

REF = "/root/reference"
DECKS = ["128x128", "128x256", "256x256", "1024x1024"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--decks", nargs="*", default=DECKS)
    ap.add_argument("--variance-runs", type=int, default=5)
    ap.add_argument("--out", default="runs")
    args = ap.parse_args(argv)

    from advanced_hpc_lbm_tpu import cli

    os.makedirs(args.out, exist_ok=True)
    scratch = os.path.join(args.out, ".scratch")
    os.makedirs(scratch, exist_ok=True)

    for deck in args.decks:
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli.main([
                f"{REF}/input_{deck}.params",
                f"{REF}/obstacles_{deck}.dat",
                "--out-dir", scratch,
            ])
        assert rc == 0, f"{deck} failed:\n{buf.getvalue()}"
        path = os.path.join(args.out, f"lbm_tpu_{deck}.out")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"captured {path}", file=sys.stderr)
        print(buf.getvalue())

    # variance capture: the same deck N times in one process (executable
    # stays warm after run 1 — matching the cluster's repeated-job setup)
    if args.variance_runs <= 0:
        return 0
    deck = "1024x1024"
    var_path = os.path.join(args.out, f"lbm_tpu_{deck}_array.out")
    with open(var_path, "w") as fh:
        for i in range(args.variance_runs):
            buf = io.StringIO()
            t0 = time.time()
            with redirect_stdout(buf):
                rc = cli.main([
                    f"{REF}/input_{deck}.params",
                    f"{REF}/obstacles_{deck}.dat",
                    "--out-dir", scratch,
                ])
            assert rc == 0
            fh.write(f"==== run {i + 1}/{args.variance_runs} "
                     f"(wall {time.time() - t0:.3f}s) ====\n")
            fh.write(buf.getvalue())
    print(f"captured {var_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
