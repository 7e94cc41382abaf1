"""Probe: close the scan kernel toward its madd floor (VERDICT r2 #3).

Round-2 production scan runs ~11.5 ns/entry vs the 8.4 ns madd floor (one
mixed add at the measured 950 M mont/s, 8 products each).  Two suspected
overheads and one throughput lever:

  base : production msm_scan (in-kernel per-step [lblk,60]->[60,lblk]
         transpose; pair-writes) — the reference point.
  pret : gathered rows pre-transposed by XLA to [NFB, K, 64, lblk] so the
         kernel reads limb-major slabs directly (kills the per-step
         transpose; adds an XLA transpose pass over the gathered bytes —
         timed separately).
  dual : each kernel invocation interleaves TWO independent fragment scans
         (two accumulators per lane).  The two madds per step are mutually
         independent, so their sequential limb chains can overlap; issued as
         two G=4 mont_many groups (the compiler schedules them together).
  dualf: same, but the product groups of both madds are merged into G=8
         mont_many calls (measured as a regression in the isolated mont
         sweep — re-tested here in kernel context).
  pret+dual: both.

Run on TPU: python experiments/scan_tune_probe.py [--nf 65536] [--lblk 256]
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
    L, LP, load_consts, make_consts_array, add_many, sub_many, mont_many,
    fr_add_lazy,
)
from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.ops.pallas.ec import (  # noqa: E402
    Pt, madd, pt_identity, pt_pack, pt_select,
)

K = PS.K
TW = PS.TW
TWR = PS.TWR


# ---------------------------------------------------------------------------
# pret: pre-transposed input layout.


def _kern_pret(lblk, consts_ref, rows_ref, keys_ref, out_ref):
    """rows_ref: [1, K, 64, lblk] (limb-major slabs); otherwise identical to
    the production pair-write scan body."""
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    key0 = jnp.full((1, lblk), -1, jnp.int32)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def step(j, acc, kprev):
        slab = rows_ref[0, j, 0:3 * L, :]                 # [3L, lblk]
        x2 = slab[0 * L:1 * L]
        y2 = slab[1 * L:2 * L]
        td2 = slab[2 * L:3 * L]
        kj = keys_ref[pl.ds(j, 1), :]
        same = kj == kprev
        acc = madd(pt_select(same, acc, ident), x2, y2, td2, c)
        return acc, kj

    def body(j2, state):
        acc, kprev = state
        acc, kprev = step(2 * j2, acc, kprev)
        even = jnp.concatenate([pt_pack(acc), pad], axis=0)
        acc, kprev = step(2 * j2 + 1, acc, kprev)
        odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
        out_ref[:, j2, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
        return acc, kprev

    jax.lax.fori_loop(0, K // 2, body, (ident, key0))


def msm_scan_pret(rows_t: jnp.ndarray, keys_t: jnp.ndarray) -> jnp.ndarray:
    """rows_t: [NFB, K, 64, lblk]; keys_t: [K, NF]."""
    nfb, _, _, lblk = rows_t.shape
    nf = nfb * lblk
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        partial(_kern_pret, lblk),
        grid=(nfb,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 64, lblk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K // 2, 2 * TW), jnp.uint32),
        interpret=False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, rows_t, keys_t)


def pre_transpose(rows: jnp.ndarray, lblk: int) -> jnp.ndarray:
    """[NF, K, TWR] -> [NF//lblk, K, 64, lblk] limb-major slabs."""
    nf = rows.shape[0]
    r = rows.reshape(nf // lblk, lblk, K, TWR)[:, :, :, :64]
    return jnp.transpose(r, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# dual: two independent fragment scans per invocation.


def _madd2(p1: Pt, xa, ya, tda, q1: Pt, xb, yb, tdb, c, fuse: bool):
    if not fuse:
        return madd(p1, xa, ya, tda, c), madd(q1, xb, yb, tdb, c)
    pv = c.p
    s11a, s22a, s11b, s22b = add_many(
        [(p1.x, p1.y), (xa, ya), (q1.x, q1.y), (xb, yb)]
    )
    a1, b1, c1, e1, a2, b2, c2, e2 = mont_many(
        [(p1.x, xa), (p1.y, ya), (p1.t, tda), (s11a, s22a),
         (q1.x, xb), (q1.y, yb), (q1.t, tdb), (s11b, s22b)], pv
    )
    d1, d2 = p1.z, q1.z
    h1 = fr_add_lazy(a1, b1)
    h2 = fr_add_lazy(a2, b2)
    e1x, f1, e2x, f2 = sub_many([(e1, h1), (d1, c1), (e2, h2), (d2, c2)], c)
    g1 = fr_add_lazy(d1, c1)
    g2 = fr_add_lazy(d2, c2)
    x31, y31, t31, z31, x32, y32, t32, z32 = mont_many(
        [(e1x, f1), (g1, h1), (e1x, h1), (f1, g1),
         (e2x, f2), (g2, h2), (e2x, h2), (f2, g2)], pv
    )
    return Pt(x31, y31, t31, z31), Pt(x32, y32, t32, z32)


def _kern_dual(lblk, fuse, pret, consts_ref, rowsA_ref, rowsB_ref,
               keysA_ref, keysB_ref, outA_ref, outB_ref):
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    key0 = jnp.full((1, lblk), -1, jnp.int32)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def slab_of(ref, j):
        if pret:
            return ref[0, j, 0:3 * L, :]
        return jnp.transpose(ref[:, j, 0:3 * L])

    def step(j, accA, kpA, accB, kpB):
        sa = slab_of(rowsA_ref, j)
        sb = slab_of(rowsB_ref, j)
        kja = keysA_ref[pl.ds(j, 1), :]
        kjb = keysB_ref[pl.ds(j, 1), :]
        accA = pt_select(kja == kpA, accA, ident)
        accB = pt_select(kjb == kpB, accB, ident)
        accA, accB = _madd2(
            accA, sa[0:L], sa[L:2 * L], sa[2 * L:3 * L],
            accB, sb[0:L], sb[L:2 * L], sb[2 * L:3 * L], c, fuse
        )
        return accA, kja, accB, kjb

    def body(j2, state):
        accA, kpA, accB, kpB = state
        accA, kpA, accB, kpB = step(2 * j2, accA, kpA, accB, kpB)
        evA = jnp.concatenate([pt_pack(accA), pad], axis=0)
        evB = jnp.concatenate([pt_pack(accB), pad], axis=0)
        accA, kpA, accB, kpB = step(2 * j2 + 1, accA, kpA, accB, kpB)
        odA = jnp.concatenate([pt_pack(accA), pad], axis=0)
        odB = jnp.concatenate([pt_pack(accB), pad], axis=0)
        outA_ref[:, j2, :] = jnp.transpose(jnp.concatenate([evA, odA], axis=0))
        outB_ref[:, j2, :] = jnp.transpose(jnp.concatenate([evB, odB], axis=0))
        return accA, kpA, accB, kpB

    jax.lax.fori_loop(0, K // 2, body, (ident, key0, ident, key0))


def msm_scan_dual(rows, keys_t, lblk, fuse=False, pret=False):
    """rows: [NF, K, TWR] (or pre-transposed [NFB, K, 64, lblk] pairs when
    pret); keys_t: [K, NF].  Block i scans fragments [i*lblk..) as stream A
    and [(nf/2)+i*lblk..) as stream B."""
    consts = jnp.asarray(make_consts_array())
    if pret:
        nfb = rows.shape[0]
        nf = nfb * lblk
        half = nfb // 2
        row_spec_a = pl.BlockSpec((1, K, 64, lblk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        row_spec_b = pl.BlockSpec((1, K, 64, lblk), lambda i, h=half: (i + h, 0, 0, 0), memory_space=pltpu.VMEM)
    else:
        nf = rows.shape[0]
        half = nf // 2 // lblk
        row_spec_a = pl.BlockSpec((lblk, K, TWR), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        row_spec_b = pl.BlockSpec((lblk, K, TWR), lambda i, h=half: (i + h, 0, 0), memory_space=pltpu.VMEM)
    grid = (nf // 2 // lblk,)
    halfc = nf // 2 // lblk
    outs = pl.pallas_call(
        partial(_kern_dual, lblk, fuse, pret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec_a,
            row_spec_b,
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i, h=halfc: (0, i + h), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nf // 2, K // 2, 2 * TW), jnp.uint32),
            jax.ShapeDtypeStruct((nf // 2, K // 2, 2 * TW), jnp.uint32),
        ],
        interpret=False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(consts, rows, rows, keys_t, keys_t)
    return outs



# ---------------------------------------------------------------------------
# sames: hoist the per-step kprev compare into a precomputed [K, NF] mask
# (VERDICT r2 #3's remaining candidate): XLA computes same-segment bits from
# the sorted keys (row 0 always 0 — fragment starts reset), the kernel drops
# the kprev loop state and the two per-half-step compares.


def _kern_sames(lblk, consts_ref, rows_ref, sames_ref, out_ref):
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def step(j, acc):
        slab = rows_ref[0, j, 0:3 * L, :]
        same = sames_ref[pl.ds(j, 1), :] != 0
        acc = madd(pt_select(same, acc, ident),
                   slab[0:L], slab[L:2 * L], slab[2 * L:3 * L], c)
        return acc

    def body(j2, acc):
        acc = step(2 * j2, acc)
        even = jnp.concatenate([pt_pack(acc), pad], axis=0)
        acc = step(2 * j2 + 1, acc)
        odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
        out_ref[:, j2, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
        return acc

    jax.lax.fori_loop(0, K // 2, body, ident)


def keys_to_sames(keys_t: jnp.ndarray) -> jnp.ndarray:
    """[K, NF] sorted keys -> [K, NF] int32 same-as-previous-entry bits."""
    eq = (keys_t[1:] == keys_t[:-1]).astype(jnp.int32)
    return jnp.concatenate([jnp.zeros((1, keys_t.shape[1]), jnp.int32), eq])


def msm_scan_sames(rows_t: jnp.ndarray, sames_t: jnp.ndarray) -> jnp.ndarray:
    nfb, _, _, lblk = rows_t.shape
    nf = nfb * lblk
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        partial(_kern_sames, lblk),
        grid=(nfb,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 64, lblk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K // 2, 2 * TW), jnp.uint32),
        interpret=False,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, rows_t, sames_t)


# ---------------------------------------------------------------------------


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
    print(f"{name:26s} compile {comp:6.1f}s  run {med:8.2f} ms"
          + (f"  ({per:5.2f} ns/entry)" if entries else ""), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=65536)
    ap.add_argument("--lblk", type=int, default=256)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    nf, lblk = args.nf, args.lblk
    entries = nf * K

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 1 << 13, size=(nf, K, TWR), dtype=np.int64).astype(np.uint32))
    keys = jnp.asarray(np.sort(rng.integers(0, 1 << 14, size=(K, nf)).astype(np.int32), axis=0))

    print(f"{entries/1e6:.1f} M entries, lblk={lblk}", flush=True)
    base = timeit("base (production)", jax.jit(partial(PS.msm_scan, interpret=False)),
                  rows, keys, entries=entries)

    jt = jax.jit(partial(pre_transpose, lblk=lblk))
    timeit("xla pre-transpose alone", jt, rows, entries=entries)
    rows_t = jt(rows)
    p = timeit("pret", jax.jit(msm_scan_pret), rows_t, keys, entries=entries)
    if args.check:
        assert np.array_equal(np.asarray(base), np.asarray(p)), "pret mismatch"

    for fuse, name in ((False, "dual (2x G4)"), (True, "dualf (G8)")):
        d = timeit(name, jax.jit(partial(msm_scan_dual, lblk=lblk, fuse=fuse)),
                   rows, keys, entries=entries)
        if args.check:
            b = np.asarray(base)
            got = np.concatenate([np.asarray(d[0]), np.asarray(d[1])], axis=0)
            assert np.array_equal(b, got), f"{name} mismatch"

    d = timeit("pret+dual", jax.jit(partial(msm_scan_dual, lblk=lblk, fuse=False,
                                            pret=True)), rows_t, keys, entries=entries)
    if args.check:
        b = np.asarray(base)
        got = np.concatenate([np.asarray(d[0]), np.asarray(d[1])], axis=0)
        assert np.array_equal(b, got), "pret+dual mismatch"

    sames = jax.jit(keys_to_sames)(keys)
    sm = timeit("pret+sames (hoisted mask)", jax.jit(msm_scan_sames),
                rows_t, sames, entries=entries)
    if args.check:
        assert np.array_equal(np.asarray(base), np.asarray(sm)), "sames mismatch"


if __name__ == "__main__":
    main()
