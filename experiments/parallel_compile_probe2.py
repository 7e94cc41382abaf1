"""Probe v2: thread-level overlap of REAL pipeline-stage compiles.

parallel_compile_probe.py showed threads don't wedge the runtime and tiny
compiles overlap 1.42x — but tiny programs may not exercise the remote
compile helper.  This version compiles four real window-group programs
(_stage_group at 2^17, c in {13,14,15,16} — distinct nb statics, comparable
cost): two serially, two in threads.

Run on TPU:  python experiments/parallel_compile_probe2.py
"""

from __future__ import annotations

import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    n = 1 << 17
    rng = np.random.default_rng(0)
    coords = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 31, size=(n, 2, 8), dtype=np.int64).astype(np.uint32)))
    table = MP.build_full_table(coords, interpret=False)
    jax.device_get(table[0, 0])

    def lower_one(c):
        cfg = MsmConfig(chunk_size=c)
        digits = jnp.zeros((cfg.num_windows, n), jnp.int32)
        t0 = time.time()
        MP._stage_group._jit.lower(
            table, digits, np.int32(0), nb=cfg.num_buckets, wg=cfg.num_windows,
            interpret=False,
        ).compile()
        return time.time() - t0

    for c in (15, 14):
        print(f"serial compile c={c}: {lower_one(c):.1f}s", flush=True)

    times = {}
    errs = []

    def worker(c):
        try:
            times[c] = lower_one(c)
        except Exception as e:
            errs.append((c, repr(e)))

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(c,)) for c in (16, 13)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    print(f"threaded compiles c=16,13: wall {wall:.1f}s, per-compile {times}, "
          f"errors: {errs or 'none'}", flush=True)


if __name__ == "__main__":
    main()
