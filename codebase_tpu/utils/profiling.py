"""Profiling & observability: traces, compiled-cost analysis, memory, timing.

The reference has no profiling beyond wall-clock UPS/FPS logging
(`marlbase/utils/loggers.py:55-88`, SURVEY.md §5). On TPU the interesting
signals are XLA-level: compiled FLOPs/bytes per step, device HBM usage, and
steps/s measured with a real device sync. This module wraps the JAX
profiler and compiler introspection into small host-side tools:

- `trace(log_dir)`        — TensorBoard/Perfetto trace of a code region.
- `annotate(name)`        — named sub-span inside an active trace.
- `cost_analysis(fn, *a)` — {flops, bytes accessed, ...} of the compiled fn.
- `device_memory_stats()` — per-device HBM in-use/limit (where supported).
- `StepTimer`             — synced steps/s measurement across chunks.

`python -m codebase_tpu.profile +algorithm=... env.name=...` (see
`codebase_tpu/profile.py`) composes these into a one-shot report.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed region into `log_dir`
    (viewable with TensorBoard's profile plugin or Perfetto)."""
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named span inside an active trace (shows up on the TraceMe track)."""
    return jax.profiler.TraceAnnotation(name)


def compile_and_analyze(fn, *args, static_argnums=()):
    """Compile `fn(*args)` ONCE and return (compiled executable, cost dict,
    static-memory dict). The executable is callable with the same argument
    structure — reuse it instead of re-jitting (a large fused train step can
    take minutes per compile)."""
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
    return compiled, _costs_of(compiled), _memory_of(compiled)


def _costs_of(compiled) -> Dict[str, float]:
    costs = compiled.cost_analysis()
    if not costs:
        return {}
    if isinstance(costs, (list, tuple)):  # older jax returns [dict]
        costs = costs[0]
    return dict(costs)


def _memory_of(compiled) -> Dict[str, int]:
    try:
        mem = compiled.memory_analysis()
    except Exception:
        return {}
    if mem is None:
        return {}
    out = {}
    for k in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(mem, k, None)
        if v is not None:
            out[k] = int(v)
    return out


def cost_analysis(fn, *args, static_argnums=()) -> Dict[str, float]:
    """Compile `fn(*args)` and return XLA's cost analysis for one call:
    `flops`, `bytes accessed`, and backend-specific keys. Returns {} when
    the backend reports nothing (some CPU builds)."""
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
    return _costs_of(compiled)


def compiled_memory_analysis(fn, *args, static_argnums=()) -> Dict[str, int]:
    """Static memory footprint of the compiled executable (bytes)."""
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
    return _memory_of(compiled)


def device_memory_stats() -> Dict[str, Dict[str, Any]]:
    """Per-device live memory statistics (bytes_in_use / bytes_limit where
    the runtime exposes them; CPU devices usually expose none)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        stats[str(d)] = dict(s) if s else {}
    return stats


class StepTimer:
    """Steps/s across train chunks with a forced device sync at each mark.

    Usage:
        timer = StepTimer()
        timer.mark(int(state.env_steps))   # int() syncs through the runtime
        ... more chunks ...
        timer.mark(int(state.env_steps))
        timer.rate()  # env-steps/s since the previous mark
    """

    def __init__(self):
        self._last: Optional[tuple] = None
        self._rate: Optional[float] = None

    def mark(self, steps: int) -> Optional[float]:
        now = time.time()
        if self._last is not None:
            prev_steps, prev_t = self._last
            dt = now - prev_t
            if dt > 0 and steps > prev_steps:
                self._rate = (steps - prev_steps) / dt
        self._last = (steps, now)
        return self._rate

    def rate(self) -> Optional[float]:
        return self._rate
