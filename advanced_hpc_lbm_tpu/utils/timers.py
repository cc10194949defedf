"""Four-phase wall-clock timers matching the reference CLI contract.

The reference times Init / Compute / Collate / Total with gettimeofday
(d2q9-bgk.c:155-156, :170-178, :203-213) and prints them at exit
(:218-221).  Same phases here; Collate is the device->host transfer (the
role its MPI stub reserved, d2q9-bgk.c:208).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class PhaseTimers:
    def __init__(self) -> None:
        self.elapsed: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        tic = time.time()
        try:
            yield
        finally:
            self.elapsed[name] = self.elapsed.get(name, 0.0) + time.time() - tic

    def report_lines(self) -> list[str]:
        """The exact printf block of d2q9-bgk.c:218-221."""
        total = sum(self.elapsed.get(k, 0.0) for k in ("init", "compute", "collate"))
        return [
            f"Elapsed Init time:\t\t\t{self.elapsed.get('init', 0.0):.6f} (s)",
            f"Elapsed Compute time:\t\t\t{self.elapsed.get('compute', 0.0):.6f} (s)",
            f"Elapsed Collate time:\t\t\t{self.elapsed.get('collate', 0.0):.6f} (s)",
            f"Elapsed Total time:\t\t\t{total:.6f} (s)",
        ]
