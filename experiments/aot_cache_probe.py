"""Probe: can AOT-compiled executables be serialized to disk and reloaded in
a fresh process, skipping the 100-150 s (worst case 1000 s) remote compile?
(VERDICT r2 next-round #6; the reference's analogue is the browser driver's
shader cache, shader_manager.ts:85-92 — which this rig's broken persistent
XLA cache fails to replicate.)

Uses jax.experimental.serialize_executable on the expensive program (the
2^20 window-group stage).  Run on TPU:

    python experiments/aot_cache_probe.py save    # compile + serialize
    python experiments/aot_cache_probe.py load    # fresh process: reload + run

Compare 'load' wall time against the ~100-150 s compile in 'save'.
"""

from __future__ import annotations

import pickle
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS  # noqa: E402

PATH = "/tmp/msm_aot_group_2e20.pkl"
N = 1 << 20
WG = 8
NB = 1 << 15


def specs():
    table = jax.ShapeDtypeStruct((2 * N, PS.TWR), jnp.uint32)
    digits = jax.ShapeDtypeStruct((WG, N), jnp.int32)
    return table, digits


def test_args():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 13, size=(2 * N, PS.TWR),
                                     dtype=np.int64).astype(np.uint32))
    digits = jnp.asarray(rng.integers(-NB, NB, size=(WG, N),
                                      dtype=np.int64).astype(np.int32))
    return table, digits


def save():
    from jax.experimental.serialize_executable import serialize

    fn = jax.jit(partial(MP.window_group_bucket_sums, nb=NB, interpret=False))
    t0 = time.time()
    compiled = fn.lower(*specs()).compile()
    print(f"compile: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    payload, in_tree, out_tree = serialize(compiled)
    blob = pickle.dumps((payload, in_tree, out_tree))
    open(PATH, "wb").write(blob)
    print(f"serialize: {time.time() - t0:.1f}s, {len(blob)/1e6:.1f} MB -> {PATH}",
          flush=True)
    t0 = time.time()
    out = compiled(*test_args())
    jax.device_get(out[:1, :1])
    print(f"run (sanity): {time.time() - t0:.1f}s", flush=True)


def load():
    from jax.experimental.serialize_executable import deserialize_and_load

    t_all = time.time()
    payload, in_tree, out_tree = pickle.loads(open(PATH, "rb").read())
    t0 = time.time()
    compiled = deserialize_and_load(payload, in_tree, out_tree)
    print(f"deserialize_and_load: {time.time() - t0:.1f}s", flush=True)
    args = test_args()
    t0 = time.time()
    out = compiled(*args)
    jax.device_get(out[:1, :1])
    print(f"first run: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(*args)
    jax.device_get(out[:1, :1])
    print(f"second run: {(time.time() - t0)*1e3:.1f} ms", flush=True)
    print(f"total cold-start: {time.time() - t_all:.1f}s (vs ~100-150 s compile)",
          flush=True)


if __name__ == "__main__":
    {"save": save, "load": load}[sys.argv[1]]()
