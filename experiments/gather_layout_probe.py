"""Probe: can the scan's limb-major pre-transpose ride the gather for free?

scan_tune_probe measured the pre-transposed scan kernel (`pret`) at
~8.9 ns/entry vs ~10.7 production — but a SEPARATE XLA transpose pass costs
~1.9 ns/entry, a wash.  The gather is row-count-bound (~80 M rows/s), not
bandwidth-bound, so if XLA can write the gathered rows directly in the
[NFB, K, 64, lblk] limb-major layout (fusing the transpose into the gather's
output layout), the kernel win is pocketed whole (~29 ms at 2^20).

Variants (all one jit program, timed end-to-end):
  g      : table[idx] -> [NF, K, TWR]                       (production)
  g+t    : gather then transpose to [NFB, K, 64, lblk]      (fusion test)
  gt64   : gather only cols :64 then transpose              (less traffic)

Run on TPU: python experiments/gather_layout_probe.py [--nf 32768]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS  # noqa: E402

K = PS.K
TWR = PS.TWR


def timeit(name, fn, *args, entries=0, runs=3):
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
    per = (med - 28) * 1e6 / entries if entries else 0
    print(f"{name:28s} compile {comp:6.1f}s  run {med:8.2f} ms"
          + (f"  ({per:5.2f} ns/entry)" if entries else ""), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=32768)
    ap.add_argument("--lblk", type=int, default=256)
    args = ap.parse_args()
    nf, lblk = args.nf, args.lblk
    n = nf * K // 16            # table rows ~ entries/windows at 2^20 scale
    entries = nf * K

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 13, size=(2 * n, TWR),
                                     dtype=np.int64).astype(np.uint32))
    pidx = jnp.asarray(rng.integers(0, 2 * n, size=(nf * K,),
                                    dtype=np.int64).astype(np.int32))

    def g(table, pidx):
        return table[pidx].reshape(nf, K, TWR)

    def gt(table, pidx):
        r = table[pidx].reshape(nf // lblk, lblk, K, TWR)[:, :, :, :64]
        return jnp.transpose(r, (0, 2, 3, 1))

    def gt64(table, pidx):
        r = table[pidx, :64].reshape(nf // lblk, lblk, K, 64)
        return jnp.transpose(r, (0, 2, 3, 1))

    print(f"{entries/1e6:.1f} M rows gathered from a {2*n} x {TWR} table",
          flush=True)
    timeit("gather (production)", jax.jit(g), table, pidx, entries=entries)
    timeit("gather + transpose", jax.jit(gt), table, pidx, entries=entries)
    timeit("gather[:, :64] + transpose", jax.jit(gt64), table, pidx,
           entries=entries)


if __name__ == "__main__":
    main()
