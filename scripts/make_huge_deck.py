#!/usr/bin/env python
"""Generate a reference-format deck at any size (closed box + interior
half-height wall, the bench geometry) so the huge-grid tiers can be
driven through the ordinary CLI:

    python scripts/make_huge_deck.py --size 16384 --iters 128 --out /tmp
    python -m advanced_hpc_lbm_tpu /tmp/input_16384x16384.params \\
        /tmp/obstacles_16384x16384.dat

Obstacle-file format matches the reference loader (x y blocked per
line, utils/io.py:load_obstacles)."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--out", default="/tmp")
    args = ap.parse_args(argv)
    n = args.size

    params_path = os.path.join(args.out, f"input_{n}x{n}.params")
    obst_path = os.path.join(args.out, f"obstacles_{n}x{n}.dat")
    with open(params_path, "w") as f:
        f.write(f"{n}\n{n}\n{args.iters}\n10\n0.1\n0.01\n1.85\n")
    with open(obst_path, "w") as f:
        for x in range(n):  # top and bottom walls
            f.write(f"{x} 0 1\n")
            f.write(f"{x} {n - 1} 1\n")
        for y in range(1, n - 1):  # side walls + interior half wall
            f.write(f"0 {y} 1\n")
            f.write(f"{n - 1} {y} 1\n")
            if y < n // 2:
                f.write(f"{n // 3} {y} 1\n")
    print(params_path)
    print(obst_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
