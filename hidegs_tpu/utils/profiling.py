"""Tracing / profiling utilities.

The reference has only NVTX ranges and timestamped prints (SURVEY §5.1). The
TPU equivalents: jax.profiler traces viewable in TensorBoard/XProf, named
annotations around pipeline stages, and first-class throughput counters
(Mpix/s — the BASELINE north-star metric).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict

import jax


@contextlib.contextmanager
def trace(dir_path: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(dir_path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range visible in profiler timelines (NVTX-range equivalent)."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class ThroughputMeter:
    """Running pixels/s + steps/s counter for training/rendering loops."""

    pixels_per_step: int
    _t0: float = field(default_factory=time.perf_counter)
    _steps: int = 0

    def step(self, n: int = 1):
        self._steps += n

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_s(self) -> float:
        return self._steps / max(self.seconds, 1e-9)

    @property
    def mpix_per_s(self) -> float:
        return self._steps * self.pixels_per_step / max(self.seconds, 1e-9) / 1e6

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def summary(self) -> Dict[str, float]:
        return {
            "steps_per_s": self.steps_per_s,
            "mpix_per_s": self.mpix_per_s,
            "seconds": self.seconds,
            "steps": float(self._steps),
        }


def timestamped_print(*args, **kwargs):
    """safe_state-style timestamped stdout (utils/general_utils.py:116-132)."""
    print(f"[{time.strftime('%d/%m %H:%M:%S')}]", *args, **kwargs)
