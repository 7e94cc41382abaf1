"""Probe: attribute the scan's gap over its madd floor (VERDICT r3 #5).

The production rm+sames scan runs ~9.9 ns/entry at 2^20 scale; one mixed add
at the measured mont throughput is ~8.4 ns.  This probe ablates the kernel's
non-madd components one at a time, same shapes as production
(lblk=256, K=64 steps, TWR=128 rows):

  full      : msm_scan_rm_sames as shipped (select + per-step slab read +
              in-kernel transpose + pair-packed output writes).
  nosel     : the segment-start pt_select dropped (acc madds unconditionally;
              wrong results, timing only).
  nowrite   : output written only on the last loop iteration (ablates the
              pair-packed stores; wrong results, timing only).
  hoistread : the slab read+transpose hoisted out of the loop (every step
              madds the same slab — ablates the per-step VMEM read + permute;
              wrong results, timing only).
  floor     : hoistread + nosel + nowrite — the pure madd chain, the
              honest in-kernel floor to compare against the 8.4 ns estimate.

Run on TPU:  python experiments/scan_floor_probe.py [--nf 65536]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS
from webgpu_msm_twisted_edwards_tpu.ops.pallas.common import (
    L,
    LP,
    load_consts,
    make_consts_array,
)
from webgpu_msm_twisted_edwards_tpu.ops.pallas.ec import (
    madd,
    pt_identity,
    pt_pack,
    pt_select,
)

K = PS.K
TW = PS.TW
TWR = PS.TWR


def _kern(lblk, sel, write, perstep_read, consts_ref, rows_ref, sames_ref,
          out_ref):
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)
    slab0 = jnp.transpose(rows_ref[:, 0, 0:3 * L])

    def step(j, acc):
        slab = jnp.transpose(rows_ref[:, j, 0:3 * L]) if perstep_read else slab0
        d2 = slab[0 * L:1 * L]
        s2 = slab[1 * L:2 * L]
        td2 = slab[2 * L:3 * L]
        if sel:
            same = sames_ref[pl.ds(j, 1), :] != 0
            acc = pt_select(same, acc, ident)
        return madd(acc, d2, s2, td2, c)

    def body(j2, acc):
        acc = step(2 * j2, acc)
        even = jnp.concatenate([pt_pack(acc), pad], axis=0)
        acc = step(2 * j2 + 1, acc)
        if write:
            odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
            out_ref[:, j2, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
        else:
            @pl.when(j2 == K // 2 - 1)
            def _():
                odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
                out_ref[:, j2, :] = jnp.transpose(
                    jnp.concatenate([even, odd], axis=0))
        return acc

    jax.lax.fori_loop(0, K // 2, body, ident)


def variant(rows, sames_t, sel=True, write=True, perstep_read=True):
    nf = rows.shape[0]
    lblk = PS.LBLK
    while nf % lblk != 0:
        lblk //= 2
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        partial(_kern, lblk, sel, write, perstep_read),
        grid=(nf // lblk,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, K, TWR), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K // 2, 2 * TW), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024, has_side_effects=True),
    )(consts, rows, sames_t)


def timed(name, fn, *args, entries, runs=5):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(out[0, 0, 0])
    comp = time.time() - t0
    ts = []
    for _ in range(runs):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(out[0, 0, 0])
        ts.append((time.time() - t0) * 1e3)
    med = sorted(ts)[len(ts) // 2]
    per = (med - 28) * 1e6 / entries
    print(f"{name:12s} compile {comp:5.1f}s  run {med:8.2f} ms  "
          f"({per:5.2f} ns/entry)", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=65536)
    args = ap.parse_args()
    nf = args.nf
    entries = nf * K
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 1 << 13, size=(nf, K, TWR),
                                    dtype=np.int64).astype(np.uint32))
    keys = jnp.asarray(np.sort(
        rng.integers(0, 1 << 14, size=(K, nf)).astype(np.int32), axis=0))
    sames = jax.jit(PS.keys_to_sames)(keys)
    print(f"{entries/1e6:.1f} M entries")

    full = timed("full", jax.jit(partial(PS.msm_scan_rm_sames,
                                         interpret=False)),
                 rows, sames, entries=entries)
    v = jax.jit(partial(variant, sel=True, write=True, perstep_read=True))
    base = timed("full(probe)", v, rows, sames, entries=entries)
    nosel = timed("nosel", jax.jit(partial(variant, sel=False)),
                  rows, sames, entries=entries)
    nowrite = timed("nowrite", jax.jit(partial(variant, write=False)),
                    rows, sames, entries=entries)
    hoist = timed("hoistread", jax.jit(partial(variant, perstep_read=False)),
                  rows, sames, entries=entries)
    floor = timed("floor", jax.jit(partial(variant, sel=False, write=False,
                                           perstep_read=False)),
                  rows, sames, entries=entries)
    print(f"\nattribution (ns/entry): select {base - nosel:+.2f}, "
          f"writes {base - nowrite:+.2f}, slab read+transpose "
          f"{base - hoist:+.2f}, madd floor {floor:.2f}, "
          f"unexplained {base - floor - (base - nosel) - (base - nowrite) - (base - hoist):+.2f}")


if __name__ == "__main__":
    main()
