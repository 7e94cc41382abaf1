"""Probe: does the scan's [lblk, K, TW=64] output pay a 2x lane-padding tax,
and does writing two steps per [lblk, 128] row fix it?

Kernels (same madd scan body as production):
  A. out64 : out [nf, K, 64]   — one 64-lane write per step (current design)
  B. out128: out [nf, K/2, 128] — buffer one step, write pairs at full tiles

Run on TPU:  python experiments/scan_out_probe.py [--nf 65536]
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
    L, LP, load_consts, make_consts_array, sweep_many,
)
from webgpu_msm_twisted_edwards_tpu.ops.pallas.ec import (  # noqa: E402
    madd, pt_identity, pt_pack, pt_select,
)
from webgpu_msm_twisted_edwards_tpu.ops.pallas.scan import K, TW, TWR  # noqa: E402

LBLK = 256


def _step(j, acc, kprev, rows_ref, keys_ref, sgn_ref, c, ident):
    slab = jnp.transpose(rows_ref[:, j, 0:3 * L])
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
    return acc, kj


def kern64(lblk, consts_ref, rows_ref, keys_ref, sgn_ref, out_ref):
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def body(j, state):
        acc, kprev = state
        acc, kj = _step(j, acc, kprev, rows_ref, keys_ref, sgn_ref, c, ident)
        out_ref[:, j, :] = jnp.transpose(jnp.concatenate([pt_pack(acc), pad], axis=0))
        return acc, kj

    jax.lax.fori_loop(0, K, body, (ident, jnp.full((1, lblk), -1, jnp.int32)))


def kern128(lblk, consts_ref, rows_ref, keys_ref, sgn_ref, out_ref):
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def body(j2, state):
        acc, kprev = state
        acc, kprev = _step(2 * j2, acc, kprev, rows_ref, keys_ref, sgn_ref, c, ident)
        even = jnp.concatenate([pt_pack(acc), pad], axis=0)          # [64, lblk]
        acc, kprev = _step(2 * j2 + 1, acc, kprev, rows_ref, keys_ref, sgn_ref, c, ident)
        odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
        out_ref[:, j2, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
        return acc, kprev

    jax.lax.fori_loop(0, K // 2, body, (ident, jnp.full((1, lblk), -1, jnp.int32)))


def build(kern, nf, out_steps, out_w, lblk=LBLK):
    consts = jnp.asarray(make_consts_array())
    grid = (nf // lblk,)
    return pl.pallas_call(
        partial(kern, lblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, K, TWR), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, out_steps, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, out_steps, out_w), jnp.uint32),
        interpret=False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    ), consts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=65536)
    args = ap.parse_args()
    nf = args.nf
    entries = nf * K

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 1 << 13, size=(nf, K, TWR), dtype=np.int64).astype(np.uint32))
    keys = jnp.asarray(np.sort(rng.integers(0, 1 << 14, size=(K, nf)).astype(np.int32), axis=0))
    sgn = jnp.asarray((rng.random((K, nf)) < 0.5).astype(np.int32))

    print(f"{entries/1e6:.1f} M entries", flush=True)
    for name, kern, steps, w in (("out64 ", kern64, K, 64),
                                 ("out128", kern128, K // 2, 128)):
        fn, consts = build(kern, nf, steps, w)
        jfn = jax.jit(lambda a, b, c2: fn(consts, a, b, c2))
        t0 = time.time()
        out = jfn(rows, keys, sgn)
        jax.device_get(out[:1, :1, :1])
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jfn(rows, keys, sgn)
            jax.device_get(out[:1, :1, :1])
            ts.append((time.time() - t0) * 1e3)
        med = sorted(ts)[1]
        print(f"{name} compile {comp:6.1f}s  run {med:8.2f} ms "
              f"({entries / (med - 28) / 1e3:.0f} M entries/s)", flush=True)


if __name__ == "__main__":
    main()
