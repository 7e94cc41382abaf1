"""Profiling/tracing helpers.

The reference measures wall-clock only (reference: src/ui/Benchmark.tsx:29-39
performance.now(); full_benchmarks.ts:62-107), with a separate data-transfer
benchmark and no GPU timestamp queries.  The TPU framework upgrades this with
jax.profiler device traces while keeping the same wall-clock protocol
(first-run-vs-steady split) in benchmarks/timing.py.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/msm_trace"):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf —
    per-kernel device timings, HBM traffic, and fusion boundaries (the
    capability WebGPU timestamp queries would have given the reference)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    """performance.now()-style wall-clock span (reference:
    ui/Benchmark.tsx:29-39)."""
    t0 = time.time()
    try:
        yield
    finally:
        sink(f"{label}: {(time.time() - t0) * 1e3:.1f} ms")


def annotate(name: str):
    """Named trace span for the XProf timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
