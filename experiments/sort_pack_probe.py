"""Probe: trim the per-group sort by packing key+sign+index into fewer sort
operands (VERDICT r2 next-round #1b).

The production pipeline sorts TWO i32 operands per window group
(`lax.sort((keys, idxs), num_keys=1)`, ops/msm_pipeline.py:103); round-2
measured each extra payload operand at ~21 ms per 8-window group at 2^20.
Within-bucket order is irrelevant (EC addition is commutative), so key, sign
and row index can fuse into ONE sortable integer:

    v = ((key << 1 | sign) << log2(n)) | idx        (sentinel: key = nb)

Bit budget: (c bits incl sentinel carry) + 1 sign + log2(n) index.
  - c=13, n <= 2^18  -> 32 bits: single u32 sort (the multichip per-shard
    and mid-size single-chip regime).
  - c=16, n = 2^20   -> 37 bits: needs one i64 operand (XLA emulates 64-bit
    compares on TPU — measured here against the 2xi32 variadic sort).

Run on TPU: python experiments/sort_pack_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(name, fn, *args, runs=5):
    t0 = time.time()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf[(slice(0, 1),) * leaf.ndim])
    comp = time.time() - t0
    ts = []
    for _ in range(runs):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf[(slice(0, 1),) * leaf.ndim])
        ts.append((time.time() - t0) * 1e3)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:34s} compile {comp:6.1f}s  run {med:8.2f} ms", flush=True)


def two_op(keys, idxs):
    ks, vs = lax.sort((keys, idxs), dimension=1, num_keys=1)
    return ks, vs


def one_u32(packed):
    return lax.sort(packed, dimension=1)


def one_u64(packed):
    return lax.sort(packed, dimension=1)


def main():
    for wg, logn, c in ((8, 20, 16), (8, 18, 13), (4, 18, 13)):
        n = 1 << logn
        nb = 1 << (c - 1)
        rng = np.random.default_rng(0)
        keys = rng.integers(0, nb + 1, size=(wg, n)).astype(np.int32)
        sign = rng.integers(0, 2, size=(wg, n)).astype(np.int32)
        idx = np.broadcast_to(np.arange(n, dtype=np.int32), (wg, n)).copy()
        idxs = np.where(sign, idx + n, idx)
        print(f"--- wg={wg} n=2^{logn} c={c} (key bits {c}, +sign, "
              f"+{logn} idx = {c + 1 + logn})", flush=True)

        timeit("2-op i32 sort (production)", jax.jit(two_op),
               jnp.asarray(keys), jnp.asarray(idxs))

        bits = c + 1 + logn
        if bits <= 32:
            packed = ((keys.astype(np.uint32) << 1 | sign.astype(np.uint32))
                      << logn) | idx.astype(np.uint32)
            timeit("1-op u32 packed sort", jax.jit(one_u32), jnp.asarray(packed))
        packed64 = ((keys.astype(np.int64) << 1 | sign.astype(np.int64))
                    << logn) | idx.astype(np.int64)
        with jax.enable_x64(True):
            timeit("1-op i64 packed sort", jax.jit(one_u64),
                   jnp.asarray(packed64))


if __name__ == "__main__":
    main()
