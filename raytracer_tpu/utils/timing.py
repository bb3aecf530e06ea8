"""Stage timing + render metrics (SURVEY.md §5.1/§5.5).

The reference prints Total / SPPM / RT wall-clock seconds at exit
(main.rs:57-71); we keep the same three-stage summary and add the metrics it
never measured: rays traced (primaries + executed bounces), photons
deposited, Mrays/s. ``jax.profiler`` traces can be captured with
``--profile-dir``.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class StageTimer:
    stages: Dict[str, float] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)
    _start: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def count(self, name: str, value: float):
        self.counters[name] = self.counters.get(name, 0.0) + float(value)

    def summary(self) -> str:
        total = time.time() - self._start
        lines = [f"Total: {total:.2f}s"]
        for name, secs in self.stages.items():
            lines.append(f"{name}: {secs:.2f}s")
        for name, v in self.counters.items():
            if name.endswith("_rays") and total > 0:
                lines.append(f"{name}: {v/1e6:.2f}M ({v/total/1e6:.2f} Mrays/s)")
            else:
                lines.append(f"{name}: {v:,.0f}")
        return "\n".join(lines)


@dataclass
class Progress:
    """Live progress line for long renders (the indicatif::ProgressBar
    analog, camera.rs:76,124-126): one stderr line per completed unit with
    ETA and optional Mrays/s. Plain carriage-return ticking — no external
    dependency, silent when not a TTY unless ``force``."""
    total: int
    label: str = "render"
    force: bool = False
    _done: int = 0
    _rays: float = 0.0
    _start: float = field(default_factory=time.time)

    @property
    def enabled(self) -> bool:
        """Whether ticks will render (callers may skip host-device syncs
        whose only purpose is an accurate progress line)."""
        import sys
        return self.force or sys.stderr.isatty()

    def tick(self, units: int = 1, rays: float = 0.0):
        self._done += units
        self._rays += float(rays)
        if not self.enabled:
            return
        import sys
        elapsed = time.time() - self._start
        rate = self._done / elapsed if elapsed > 0 else 0.0
        eta = (self.total - self._done) / rate if rate > 0 else float("inf")
        msg = (f"\r{self.label}: {self._done}/{self.total} "
               f"[{elapsed:.0f}s elapsed, ETA {eta:.0f}s]")
        if self._rays:
            msg += f" {self._rays / elapsed / 1e6:.1f} Mrays/s"
        end = "\n" if self._done >= self.total else ""
        print(msg, end=end, file=sys.stderr, flush=True)


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    if profile_dir:
        import jax
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield
