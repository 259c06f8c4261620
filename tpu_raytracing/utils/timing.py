"""Per-stage build/trace timing (reference: the run() macro, src/Common.cuh:369-388).

The reference wraps every build kernel in CUDA events and prints per-kernel
milliseconds on frame 0. Here each stage is a named section timed around
``jax.block_until_ready`` with the same report format, plus an optional
jax.profiler trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Collects named stage timings; prints like the reference when enabled."""

    def __init__(self, should_print: bool = False):
        self.should_print = should_print
        self.stages: List[tuple] = []

    @contextlib.contextmanager
    def stage(self, name: str, result_getter=None):
        start = time.perf_counter()
        out = {}
        yield out
        if out.get("value") is not None:
            jax.block_until_ready(out["value"])
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        self.stages.append((name, elapsed_ms))
        if self.should_print:
            # Same line format as the reference's run() macro.
            print(f"{name} time elapsed: {elapsed_ms:f}ms")

    def run(self, name: str, fn, *args, **kwargs):
        """Time ``fn`` including device completion; returns its result."""
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        result = jax.block_until_ready(result)
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        self.stages.append((name, elapsed_ms))
        if self.should_print:
            print(f"{name} time elapsed: {elapsed_ms:f}ms")
        return result

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, ms in self.stages:
            out[name] = out.get(name, 0.0) + ms
        return out


class FPSCounter:
    """Adaptive-window FPS counter (reference: ComputeFPS, src/main.cu:194-213)."""

    def __init__(self):
        self.frame_count = 0
        self.fps_limit = 1
        self.last = time.perf_counter()
        self.fps: Optional[float] = None

    def tick(self) -> Optional[float]:
        self.frame_count += 1
        if self.frame_count >= self.fps_limit:
            now = time.perf_counter()
            elapsed = now - self.last
            self.fps = self.frame_count / elapsed if elapsed > 0 else None
            # Adapt the averaging window toward ~1 report/second.
            if self.fps:
                self.fps_limit = max(1, int(self.fps))
            self.frame_count = 0
            self.last = now
        return self.fps
