"""Probe: do two XLA compiles overlap when issued from THREADS of one process?

First-run latency is dominated by the remote compile helper (50-340 s for the
full staged pipeline).  The staged split means 4-5 independent programs — if
the helper accepts concurrent compilations from one client, threading the
stage compiles could cut the cold start nearly in half.  (Two PROCESSES are
known to wedge the helper for 20+ minutes — CLAUDE.md; this probe tests the
in-process path only.)

Run on TPU:  python experiments/parallel_compile_probe.py
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_fn(shift: int, steps: int = 64):
    """A compile-heavy-ish jit: a fori_loop of fused vector ops whose constants
    differ per `shift`, so each variant compiles separately."""
    def body(i, x):
        return (x * np.uint32(2654435761 + shift) + i) ^ (x >> np.uint32(shift % 13 + 1))

    def fn(x):
        return jax.lax.fori_loop(0, steps, body, x)

    return jax.jit(fn)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    x = jax.device_put(jnp.arange(8 * (1 << 16), dtype=jnp.uint32).reshape(8, 1 << 16))

    # Serial baseline: compile two fresh program variants back to back.
    t0 = time.time()
    for s in (3, 5):
        make_fn(s).lower(x).compile()
    serial = time.time() - t0
    print(f"serial 2-compile: {serial:.1f}s")

    # Threaded: two more fresh variants concurrently.
    errs = []

    def compile_one(s):
        try:
            make_fn(s).lower(x).compile()
        except Exception as e:  # record, don't crash the probe
            errs.append((s, repr(e)))

    t0 = time.time()
    threads = [threading.Thread(target=compile_one, args=(s,)) for s in (7, 11)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    par = time.time() - t0
    print(f"threaded 2-compile: {par:.1f}s  (errors: {errs or 'none'})")
    print(f"overlap factor: {serial / par:.2f}x" if par else "n/a")

    # Sanity: the device still works after concurrent compiles.
    y = make_fn(3)(x)
    print("post-probe dispatch ok:", int(jax.device_get(y[0, 0])) >= 0)


if __name__ == "__main__":
    main()
