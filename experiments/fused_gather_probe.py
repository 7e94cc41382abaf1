"""Probe: in-kernel per-row VMEM gather + scan compute — do the row copies
overlap with VPU work, and at what rate does a fused gather+scan run?

Three kernels over the same shapes as the production scan
(lblk lanes x K steps, TWR=64 table rows):
  A. copy-only:   per-entry dynamic row copy table->scratch (fori loop)
  B. scan-only:   the production madd scan body on pre-gathered rows
  C. fused:       copy phase + scan phase in one kernel

If time(C) ~= time(A) + time(B), the copies serialize with compute; if
time(C) ~= max(A, B), they overlap.  Compare against the XLA-gather baseline
(~80 M rows/s) to size the win.

Run on TPU:  python experiments/fused_gather_probe.py [--ns 17] [--blocks 64]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webgpu_msm_twisted_edwards_tpu.ops.pallas.common import (  # noqa: E402
    L, load_consts, make_consts_array, sweep_many,
)
from webgpu_msm_twisted_edwards_tpu.ops.pallas.ec import (  # noqa: E402
    madd, pt_identity, pt_pack, pt_select,
)
from webgpu_msm_twisted_edwards_tpu.ops.pallas.scan import K, TW, TWR  # noqa: E402

LBLK = 256


def _copy_phase(table_ref, pidx_ref, scratch_ref, lblk):
    """Gather lblk*K rows of table into scratch (row e serves step e//lblk)."""
    def body(e, _):
        idx = pidx_ref[e // lblk, e % lblk]
        scratch_ref[pl.ds(e, 1), :] = table_ref[pl.ds(idx, 1), :]
        return 0

    jax.lax.fori_loop(0, lblk * K, body, 0, unroll=False)


def _scan_phase(consts_ref, rows2d_ref, keys_ref, sgn_ref, out_ref, lblk):
    """The production scan body, reading rows for step j at rows2d[j*lblk:]."""
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    key0 = jnp.full((1, lblk), -1, jnp.int32)
    from webgpu_msm_twisted_edwards_tpu.ops.pallas.common import LP
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def body(j, state):
        acc, kprev = state
        slab = jnp.transpose(rows2d_ref[pl.ds(j * lblk, lblk), 0:3 * L])
        x2 = slab[0 * L:1 * L]
        y2 = slab[1 * L:2 * L]
        td2 = slab[2 * L:3 * L]
        neg = sgn_ref[pl.ds(j, 1), :] != 0
        q4 = jnp.broadcast_to(c.q4, x2.shape)
        nx2, ntd2 = sweep_many([q4 - x2, q4 - td2])
        x2 = jnp.where(neg, nx2, x2)
        td2 = jnp.where(neg, ntd2, td2)
        kj = keys_ref[pl.ds(j, 1), :]
        same = kj == kprev
        acc = madd(pt_select(same, acc, ident), x2, y2, td2, c)
        packed = jnp.concatenate([pt_pack(acc), pad], axis=0)
        out_ref[:, j, :] = jnp.transpose(packed)
        return acc, kj

    jax.lax.fori_loop(0, K, body, (ident, key0))


def kern_copy(consts_ref, pidx_ref, table_ref, keys_ref, sgn_ref, out_ref, scratch_ref, lblk):
    _copy_phase(table_ref, pidx_ref, scratch_ref, lblk)
    # Keep the copies live (no DCE): write one slice of scratch to the output.
    out_ref[:, 0, :] = scratch_ref[pl.ds(0, lblk), 0:TW]


def kern_scan(consts_ref, pidx_ref, table_ref, keys_ref, sgn_ref, out_ref, scratch_ref, lblk):
    _scan_phase(consts_ref, scratch_ref, keys_ref, sgn_ref, out_ref, lblk)


def kern_fused(consts_ref, pidx_ref, table_ref, keys_ref, sgn_ref, out_ref, scratch_ref, lblk):
    _copy_phase(table_ref, pidx_ref, scratch_ref, lblk)
    _scan_phase(consts_ref, scratch_ref, keys_ref, sgn_ref, out_ref, lblk)


def build(kern, ns, nf, lblk=LBLK):
    consts = jnp.asarray(make_consts_array())
    grid = (nf // lblk,)
    return pl.pallas_call(
        partial(kern, lblk=lblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns, TWR), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, K, TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K, TW), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((lblk * K, TWR), jnp.uint32)],
        interpret=False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    ), consts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, default=17, help="log2 table slice rows")
    ap.add_argument("--nf", type=int, default=4096, help="fragments (x K entries)")
    args = ap.parse_args()
    ns = 1 << args.ns
    nf = args.nf
    entries = nf * K

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 13, size=(ns, TWR), dtype=np.int64).astype(np.uint32))
    pidx = jnp.asarray(rng.integers(0, ns, size=(K, nf), dtype=np.int64).astype(np.int32))
    keys = jnp.asarray(np.sort(rng.integers(0, 1 << 14, size=(K, nf)).astype(np.int32), axis=0))
    sgn = jnp.asarray((rng.random((K, nf)) < 0.5).astype(np.int32))

    print(f"table slice 2^{args.ns} rows ({ns*TWR*4/2**20:.0f} MB), "
          f"{entries/1e6:.1f} M entries", flush=True)
    for name, kern in (("copy-only", kern_copy), ("scan-only", kern_scan),
                       ("fused", kern_fused)):
        fn, consts = build(kern, ns, nf)
        jfn = jax.jit(lambda *a: fn(consts, *a))
        t0 = time.time()
        out = jfn(pidx, table, keys, sgn)
        jax.device_get(out[:1, :1, :1])
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jfn(pidx, table, keys, sgn)
            jax.device_get(out[:1, :1, :1])
            ts.append((time.time() - t0) * 1e3)
        med = sorted(ts)[1]
        print(f"{name:10s} compile {compile_s:6.1f}s  run {med:8.2f} ms "
              f"({entries / (med - 28) / 1e3:.0f} M entries/s, 28 ms floor subtracted)",
              flush=True)


if __name__ == "__main__":
    main()
