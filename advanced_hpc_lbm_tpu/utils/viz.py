"""Visualization of a final state — equivalent of the reference's gnuplot
script (final_state.plt:1-14: heatmap of column 5 = ||u|| -> final_state.png).

Works from a final_state.dat file (like the gnuplot original) or directly
from an in-memory state.  Matplotlib is optional; without it we fall back
to writing a PGM image (viewable anywhere, zero deps).
"""

from __future__ import annotations

import os

import numpy as np


def velocity_field_from_dat(path: str | os.PathLike) -> np.ndarray:
    """Load ||u|| (column 5, 1-based as in final_state.plt:14) into a
    (ny, nx) array using the coordinate columns."""
    data = np.loadtxt(path, usecols=[0, 1, 4])
    ii = data[:, 0].astype(int)
    jj = data[:, 1].astype(int)
    nx, ny = ii.max() + 1, jj.max() + 1
    grid = np.zeros((ny, nx))
    grid[jj, ii] = data[:, 2]
    return grid


def plot_final_state(
    dat_path: str | os.PathLike,
    out_path: str | os.PathLike = "final_state.png",
) -> str:
    """Render the ||u|| heatmap.  Returns the written path (a .pgm fallback
    if matplotlib is unavailable)."""
    grid = velocity_field_from_dat(dat_path)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6 * grid.shape[0] / grid.shape[1]))
        im = ax.imshow(grid, origin="lower", cmap="viridis")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.colorbar(im, ax=ax, label="|u|")
        fig.tight_layout()
        fig.savefig(out_path, dpi=150)
        plt.close(fig)
        return str(out_path)
    except ImportError:
        pgm = str(out_path).rsplit(".", 1)[0] + ".pgm"
        lo, hi = float(grid.min()), float(grid.max())
        scaled = ((grid - lo) / (hi - lo + 1e-30) * 255).astype(np.uint8)
        with open(pgm, "wb") as fh:
            fh.write(f"P5 {grid.shape[1]} {grid.shape[0]} 255\n".encode())
            fh.write(scaled[::-1].tobytes())
        return pgm


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="plot ||u|| heatmap of a final state")
    p.add_argument("dat", nargs="?", default="final_state.dat")
    p.add_argument("-o", "--out", default="final_state.png")
    a = p.parse_args(argv)
    print(plot_final_state(a.dat, a.out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
