"""Probe: per-dispatch host-side cost over the axon tunnel.

VERDICT r2 #1c asks to batch the staged dispatches to shave the measured
~17 ms host/dispatch tail at 2^20.  This probe measures what one extra
*asynchronously issued* dispatch actually costs end-to-end on this rig:

  - k back-to-back tiny jitted programs (each depending on the previous
    result, so they cannot be elided) + ONE 1-element fetch, vs k=1.
  - the same with a host-side slice (`arr[a:b]`) interposed between
    dispatches — the pattern the staged pipeline used per window group
    (digits_t[g*wg:(g+1)*wg] is itself a compiled device program).

Run on TPU:  python experiments/dispatch_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed(fn, runs=5):
    fn()  # compile
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append((time.time() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])

    @jax.jit
    def step(x):
        return x + 1

    x0 = jax.device_put(jnp.zeros((8, 1 << 20), jnp.int32))

    def chain(k):
        def run():
            x = x0
            for _ in range(k):
                x = step(x)
            jax.device_get(x[:1, :1])
        return run

    base = timed(chain(1))
    print(f"1 dispatch + fetch: {base:.1f} ms")
    for k in (2, 4, 8, 16):
        m = timed(chain(k))
        print(f"{k} dispatches + fetch: {m:.1f} ms  (+{(m - base) / (k - 1):.2f} ms/extra dispatch)")

    # Host-side slice cost (the staged per-group pattern:
    # digits_t[g*wg:(g+1)*wg] is itself a compiled device program).
    big = jax.device_put(jnp.zeros((16, 1 << 20), jnp.int32))

    def sliced():
        x = step(big[4:12])
        jax.device_get(x[:1, :1])

    m = timed(sliced)
    print(f"host slice + 1 dispatch + fetch: {m:.1f} ms  (slice overhead {m - base:.2f} ms)")


if __name__ == "__main__":
    main()
