"""Run parameters for the D2Q9-BGK solver.

Mirrors the reference ``t_param`` struct (d2q9-bgk.c:63-73) and the 7-line
``.params`` deck format parsed by ``initialise`` (d2q9-bgk.c:2736-2762):
nx, ny, maxIters, reynolds_dim on integer lines, then density, accel, omega.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class LBMParams:
    """Static configuration of one simulation (hashable; safe to close over
    in a jitted function — all fields are Python scalars).

    Attributes mirror t_param (d2q9-bgk.c:63-73):
      nx, ny        : grid size in cells (x = fastest-varying axis)
      max_iters     : number of timesteps
      reynolds_dim  : characteristic length for the Reynolds number
      density       : initial (and forcing-reference) fluid density
      accel         : acceleration applied to row ``ny - 2`` each step
      omega         : BGK relaxation parameter
    """

    nx: int
    ny: int
    max_iters: int
    reynolds_dim: int
    density: float
    accel: float
    omega: float

    def __post_init__(self) -> None:
        if self.nx <= 0 or self.ny <= 0:
            raise ValueError(f"grid must be positive, got {self.nx}x{self.ny}")
        if self.max_iters < 0:
            raise ValueError(f"max_iters must be >= 0, got {self.max_iters}")

    # -- fp32 helpers -------------------------------------------------------
    # The reference computes all physics in C `float`; keeping the derived
    # scalars in np.float32 reproduces its constant arithmetic exactly
    # (e.g. w1 = density * accel / 9.f at d2q9-bgk.c:230).

    @property
    def density_f32(self) -> np.float32:
        return np.float32(self.density)

    @property
    def accel_f32(self) -> np.float32:
        return np.float32(self.accel)

    @property
    def omega_f32(self) -> np.float32:
        return np.float32(self.omega)

    @property
    def accel_w1(self) -> np.float32:
        """Axis-speed forcing increment (d2q9-bgk.c:230)."""
        return np.float32(self.density_f32 * self.accel_f32 / np.float32(9.0))

    @property
    def accel_w2(self) -> np.float32:
        """Diagonal-speed forcing increment (d2q9-bgk.c:231)."""
        return np.float32(self.density_f32 * self.accel_f32 / np.float32(36.0))

    @property
    def viscosity(self) -> float:
        """Kinematic viscosity from omega (d2q9-bgk.c:2895)."""
        return float(
            np.float32(1.0 / 6.0)
            * (np.float32(2.0) / self.omega_f32 - np.float32(1.0))
        )

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny
