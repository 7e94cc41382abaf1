"""Device runtime helpers — the TPU analogue of the reference's thin WebGPU
wrapper layer (reference: src/submission/implementation/cuzk/gpu.ts:14-229).

| reference (gpu.ts)             | here                                     |
|--------------------------------|------------------------------------------|
| get_device (adapter request)   | get_device / device_info                 |
| create_and_write_sb / ub       | to_device (host->HBM, one-time staging)  |
| create_sb (output buffers)     | implicit — XLA allocates program outputs |
| create_bind_group (+layout)    | implicit — jit binds arrays to programs  |
| create_compute_pipeline        | compile (AOT-lower + compile a jit fn)   |
| execute_pipeline               | calling the compiled function            |
| read_from_gpu (staging buffer) | read_back (device->host)                 |
| device.destroy                 | delete_buffers                           |

On TPU the dispatch/bind-group machinery is the XLA runtime; what remains
worth wrapping is explicit placement, compile control, and readback, plus the
donation knob that mirrors the reference's buffer-reuse discipline (one
command encoder, storage buffers shared across passes,
reference: submission.ts:96-97).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def get_device(index: int = 0):
    """The accelerator device (reference analogue: gpu.ts:14-25
    `get_device`, which requests a high-performance adapter and errors
    without one)."""
    import jax

    devs = jax.devices()
    if not devs:
        raise RuntimeError("no JAX devices available")
    return devs[index]


def device_info() -> dict[str, Any]:
    """Device limits/identity (reference analogue:
    miscellaneous/print_device_limits.ts)."""
    import jax

    d = get_device()
    return {
        "backend": jax.default_backend(),
        "kind": d.device_kind,
        "id": d.id,
        "num_devices": jax.device_count(),
        "process_index": d.process_index,
        "memory_stats": (d.memory_stats() if hasattr(d, "memory_stats") else None),
    }


def device_memory_bytes(default: int = 8 * (1 << 30)) -> int:
    """Reported device HBM capacity (bytes).  Load-bearing: the pipeline
    derives its window-group memory cap from this
    (ops/msm_pipeline.py::default_window_group) — the analogue of the
    reference sizing its dispatches to the 128 MB binding limit
    (reference: README.md:497-526).

    When the runtime reports no memory stats (the tunneled axon runtime
    returns None), HBM capacity is derived from the device-kind string; only
    an unrecognized kind falls back to a conservative 8 GB.  Over-estimating
    risks an OOM mid-pipeline; under-estimating splits the work into more
    window groups (a v5e mis-sized to 8 GB ran 2^20 with window_group 4
    instead of 8 — worse sort amortization and 2x the per-group fixed kernel
    costs, see the round-3 XProf trace in experiments/trace_probe.py)."""
    dev = get_device()
    try:
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    kind = getattr(dev, "device_kind", "").lower()
    gib = 1 << 30
    #: Published per-chip HBM capacities.
    for pattern, cap in (
        ("v5 lite", 16), ("v5e", 16), ("v5p", 95), ("v6 lite", 32),
        ("v6e", 32), ("v4", 32), ("v3", 16), ("v2", 8),
    ):
        if pattern in kind:
            return cap * gib
    return default


def to_device(arr: np.ndarray, device=None):
    """Stage a host array into device HBM once (reference analogue:
    create_and_write_sb, gpu.ts:33-61 — the one bulk host->device write)."""
    import jax

    return jax.device_put(arr, device or get_device())


def read_back(arr) -> np.ndarray:
    """Device -> host (reference analogue: read_from_gpu's staging-buffer
    copy, gpu.ts:92-135).  Keep results tiny — the pipeline is designed to
    read back only the reduced window sums."""
    return np.asarray(arr)


def compile(fn, *example_args, donate_argnums=()):
    """Eager AOT compile of a jitted function for the example shapes — the
    analogue of create_compute_pipeline(Async) (gpu.ts:190-201); XLA compile
    is the new shader compile (SURVEY.md §7 risk 5).  `donate_argnums` lets
    XLA reuse input buffers like the reference's shared storage buffers."""
    import jax

    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    return jitted.lower(*example_args).compile()


def delete_buffers(*arrays) -> None:
    """Free device buffers eagerly (reference analogue: device.destroy /
    buffer destruction, submission.ts:360)."""
    for a in arrays:
        try:
            a.delete()
        except Exception:
            pass
