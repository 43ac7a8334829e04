"""Tracing and memory observability.

The reference's only profiling surface is torch.profiler in
/root/reference/project/smoke.py:57-78 (kernel table over 100 runs) plus
the GGML engine's per-phase syslog timings and compute-buffer-size dump
(ggml_engine.h:553-556). The TPU-native equivalents:

  * `trace(logdir)` — a jax.profiler trace context. The capture contains
    per-HLO device timelines viewable in TensorBoard/Perfetto/xprof, which
    subsumes the torch.profiler kernel table.
  * `device_memory_stats()` — live HBM numbers from the PJRT allocator,
    the analogue of the engine's compute-buffer report.
  * `compiled_memory_analysis(fn, *args)` — XLA's static memory analysis
    for a jitted function (argument/output/temp/generated-code bytes),
    which the GGML engine can only estimate by allocating.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device+host profile under `logdir` (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """PJRT allocator stats for one device (bytes_in_use, peak_bytes_in_use,
    bytes_limit, ...). Returns None when the backend doesn't report them
    (e.g. the CPU platform)."""
    import jax

    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    return dict(stats) if stats else None


def compiled_memory_analysis(fn, *args, **kwargs) -> Optional[Dict[str, int]]:
    """Static memory breakdown of jit(fn) at these arg shapes.

    Keys (bytes): arguments, outputs, temps, generated_code. `fn` must
    already be a jitted callable (jax.jit result)."""
    try:
        lowered = fn.lower(*args, **kwargs)
        analysis = lowered.compile().memory_analysis()
    except Exception:
        return None
    if analysis is None:
        return None
    out = {}
    for key, attr in (
        ("arguments", "argument_size_in_bytes"),
        ("outputs", "output_size_in_bytes"),
        ("temps", "temp_size_in_bytes"),
        ("generated_code", "generated_code_size_in_bytes"),
    ):
        val = getattr(analysis, attr, None)
        if val is not None:
            out[key] = int(val)
    return out or None


def format_memory_report(fn=None, args=(), device=None) -> str:
    """Human-readable memory block for CLI --profile output."""
    lines = []
    live = device_memory_stats(device)
    if live:
        used = live.get("bytes_in_use", 0)
        peak = live.get("peak_bytes_in_use", 0)
        limit = live.get("bytes_limit", 0)
        lines.append(
            f"  HBM in use {used / 2**20:.1f} MiB, "
            f"peak {peak / 2**20:.1f} MiB"
            + (f", limit {limit / 2**20:.1f} MiB" if limit else ""))
    if fn is not None:
        static = compiled_memory_analysis(fn, *args)
        if static:
            parts = ", ".join(
                f"{k} {v / 2**20:.1f} MiB" for k, v in static.items())
            lines.append(f"  compiled program: {parts}")
    return "\n".join(lines) if lines else "  (no memory stats available)"
