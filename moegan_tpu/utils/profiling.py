"""Profiling and memory telemetry.

The reference's observability is manual CUDA memory prints every 10
batches (t2i_moe_gan.py:1219-1229 etc.). TPU-native equivalents:

- `trace(logdir)`: jax.profiler trace context for xprof/tensorboard.
- `device_memory_stats()`: per-device HBM usage (bytes in use / limit).
- `MemoryMonitor`: periodic watermark logging with a limit warning — the
  analog of the reference's batch_memory_limit check, minus the OOM-skip
  (XLA preallocates; the real adaptation knob on TPU is rematerialization
  and batch size, both config-driven).
"""

from __future__ import annotations

import contextlib
import logging

import jax

logger = logging.getLogger("moegan_tpu")


def enable_debug_mode(nans: bool = True):
    """Debug-mode numerics checking — the TPU analog of the reference's
    cudnn-determinism flags + NaN print guards (SURVEY.md §5): determinism
    is already structural (explicit PRNG threading); this adds eager NaN
    trapping so a poisoned op faults at its source instead of surfacing
    as a skipped step."""
    if nans:
        jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/moegan_trace"):
    """Profile a region: `with trace(dir): step(...)` -> xprof dump."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes); empty entries on backends
    without memory_stats support (CPU)."""
    out = []
    for d in jax.devices():
        stats = d.memory_stats() or {}
        out.append(
            {
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        )
    return out


class MemoryMonitor:
    """Log HBM watermarks every `interval` steps (ref prints every 10)."""

    def __init__(self, interval: int = 10, limit_fraction: float = 0.8):
        self.interval = interval
        self.limit_fraction = limit_fraction
        self.peak = 0

    def step(self, step_idx: int):
        if step_idx % self.interval:
            return None
        stats = device_memory_stats()
        for s in stats:
            used, limit = s.get("bytes_in_use"), s.get("bytes_limit")
            if used is None:
                continue
            self.peak = max(self.peak, s.get("peak_bytes_in_use") or used)
            if limit and used > self.limit_fraction * limit:
                logger.warning(
                    "HBM high-water: %s using %.2f/%.2f GB",
                    s["device"], used / 1e9, limit / 1e9,
                )
        return stats
