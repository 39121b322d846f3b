"""Stage timing + observability.

The reference instruments with std::chrono spans printed to stdout
(reference: examples/run_global_registration.cpp:127,242,248-251;
fpfh_manager.hpp:145-149; patchwork.hpp:335-390). The TPU equivalent must
force device sync to be meaningful — `StageTimer` wraps
``block_until_ready`` per stage, and `trace` exposes ``jax.profiler`` traces
for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, List, Tuple

import jax


class StageTimer:
    """Accumulates (stage, seconds) spans; device-synchronized."""

    def __init__(self):
        self.spans: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.spans.append((name, time.perf_counter() - t0))

    def record(self, name: str, seconds: float):
        self.spans.append((name, seconds))

    def total(self) -> float:
        return sum(s for _, s in self.spans)

    def table(self) -> str:
        """Formatted like the reference's stage tables
        (run_global_registration.cpp:168-192)."""
        width = max([len(n) for n, _ in self.spans] + [10])
        lines = ["-" * (width + 16)]
        for name, sec in self.spans:
            lines.append(f"{name:<{width}} | {sec * 1e3:>9.2f} ms")
        lines.append("-" * (width + 16))
        lines.append(f"{'total':<{width}} | {self.total() * 1e3:>9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/quatro_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
