"""Probe: DMA-pipelined in-kernel gather for the bucket-accumulation scan.

The production pipeline spends ~170 ms/MSM at 2^20 on an XLA row gather and
~165 ms on the Pallas segmented scan — sequentially, because XLA runs ops one
at a time and the round-2 fused experiment (ops/pallas/scan.py::msm_scan_fused)
staged rows with *synchronous* load/store copies that shared the VPU's port
and could not overlap.  This probe tests the remaining overlap mechanism: the
DMA engines.  A scan-kernel variant keeps the table in HBM and double-buffers
per-step row blocks with `pltpu.make_async_copy` — the scalar core issues
step j+1's 256 row descriptors while the VPU runs step j's 7-product madd, so
if descriptor issue sustains >= the scan's ~2.5 us/step of vector work, the
gather disappears behind the scan (2^20 drops toward ~330 ms).

Three measurements at production scale (8 windows x 2^20 entries):
  1. XLA gather + production rm+sames scan, timed separately (the baseline).
  2. `dma-gather`: a DMA-only gather kernel (HBM->HBM), isolating the
     descriptor issue + engine throughput with zero compute.
  3. `dma-scan`: the fused double-buffered kernel; also checked bit-exact
     against msm_scan_rm_sames on the same inputs.

Run on TPU:  python experiments/dma_gather_probe.py [--entries-log2 23]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
from webgpu_msm_twisted_edwards_tpu.ops.pallas.scan import (
    K,
    LBLK,
    TW,
    TWR,
    keys_to_sames,
    msm_scan_rm_sames,
)

#: Gathered row width in u32: the full 128-wide physical row — Mosaic
#: requires DMA slices along the lane dim to be 128-aligned, so the DMA path
#: pays the same 512 B/row as the XLA gather (a TWR=64 table would halve it;
#: tracked as a follow-up if the fused kernel wins).
GW = TWR


# ---------------------------------------------------------------------------
# Kernel: DMA-only row gather (HBM -> HBM), isolates issue + engine rate.


def _dma_gather_kernel(lblk, unroll, pidx_ref, table_ref, out_ref, sem):
    i = pl.program_id(0)
    base = i * lblk * K

    def one_j(j, _):
        def one_f(fu, _):
            # Mosaic fori_loop only supports unroll=1/full — unroll by hand.
            for u in range(unroll):
                f = fu * unroll + u
                idx = pidx_ref[j, f]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(idx, 1), :],
                    out_ref.at[pl.ds(base + f * K + j, 1), :],
                    sem,
                ).start()
            return 0

        jax.lax.fori_loop(0, lblk // unroll, one_f, 0)
        return 0

    jax.lax.fori_loop(0, K, one_j, 0)
    # One wait retires all lblk*K row copies: the DMA semaphore counts bytes,
    # and this descriptor's dst covers exactly the block's bytes.
    pltpu.make_async_copy(
        table_ref.at[pl.ds(0, lblk * K), :],
        out_ref.at[pl.ds(base, lblk * K), :],
        sem,
    ).wait()


def dma_gather(table: jnp.ndarray, pidx_t: jnp.ndarray, unroll: int = 8) -> jnp.ndarray:
    """pidx_t: [K, NF] int32 (row for fragment f, step j at [j, f]).  Returns
    [NF*K, GW] rows in fragment-major order (f*K + j)."""
    nf = pidx_t.shape[1]
    lblk = LBLK
    while nf % lblk != 0:
        lblk //= 2
    return pl.pallas_call(
        lambda *a: _dma_gather_kernel(lblk, unroll, *a),
        grid=(nf // lblk,),
        in_specs=[
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nf * K, GW), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pidx_t, table)


# ---------------------------------------------------------------------------
# Kernel: fused DMA gather + segmented scan (the rm+sames production variant
# with the XLA gather replaced by double-buffered in-kernel row DMAs).


def _dma_scan_kernel(lblk, unroll, consts_ref, pidx_ref, sames_ref, table_ref,
                     out_ref, scratch, sems):
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)
    slots = (scratch.at[0], scratch.at[1])
    wsems = (sems.at[0], sems.at[1])

    def issue(j, parity):
        def one(fu, _):
            for u in range(unroll):
                f = fu * unroll + u
                idx = pidx_ref[j, f]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(idx, 1), :],
                    slots[parity].at[pl.ds(f, 1), :],
                    wsems[parity],
                ).start()
            return 0

        jax.lax.fori_loop(0, lblk // unroll, one, 0)

    def wait(parity):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, lblk), :], slots[parity], wsems[parity]
        ).wait()

    issue(0, 0)
    issue(1, 1)

    def halfstep(j, parity, acc):
        wait(parity)
        slab = jnp.transpose(scratch[parity, :, 0:3 * L])        # [3L, lblk]
        # Refill this slot for step j+2 — traced after the slab read, so the
        # overwrite orders behind the VPU loads while the descriptor issue
        # overlaps the madd arithmetic.
        @pl.when(j + 2 < K)
        def _():
            issue(j + 2, parity)
        same = sames_ref[pl.ds(j, 1), :] != 0
        d2 = slab[0 * L:1 * L]
        s2 = slab[1 * L:2 * L]
        td2 = slab[2 * L:3 * L]
        return madd(pt_select(same, acc, ident), d2, s2, td2, c)

    def body(j2, acc):
        acc = halfstep(2 * j2, 0, acc)
        even = jnp.concatenate([pt_pack(acc), pad], axis=0)      # [TW, lblk]
        acc = halfstep(2 * j2 + 1, 1, acc)
        odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
        out_ref[:, j2, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
        return acc

    jax.lax.fori_loop(0, K // 2, body, ident)


def msm_scan_dma(table: jnp.ndarray, pidx_t: jnp.ndarray, sames_t: jnp.ndarray,
                 unroll: int = 8) -> jnp.ndarray:
    """Fused DMA-gather scan: table [nt, TWR] stays in HBM; pidx_t/sames_t
    [K, NF].  Returns T [NF, K//2, 2*TW] — identical to msm_scan_rm_sames fed
    table[pidx] rows."""
    nf = pidx_t.shape[1]
    lblk = LBLK
    while nf % lblk != 0:
        lblk //= 2
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        lambda *a: _dma_scan_kernel(lblk, unroll, *a),
        grid=(nf // lblk,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K // 2, 2 * TW), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, lblk, GW), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, pidx_t, sames_t, table)


# ---------------------------------------------------------------------------
# Harness.


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def timed(fn, *args, runs=5):
    t0 = time.time()
    _force(fn(*args))  # compile
    print(f"    (first run incl. compile: {time.time() - t0:.1f} s)")
    ts = []
    for _ in range(runs):
        t0 = time.time()
        _force(fn(*args))
        ts.append((time.time() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries-log2", type=int, default=23,
                    help="gathered entries (8 windows x 2^20 = 2^23 is the "
                         "production group at 2^20)")
    ap.add_argument("--table-log2", type=int, default=21,
                    help="table rows (doubled table at 2^20 is 2^21)")
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--unrolls", type=int, nargs="*", default=[8])
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="bit-exact check of dma-scan vs msm_scan_rm_sames "
                         "at small scale first")
    args = ap.parse_args()

    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(0)

    if args.check:
        _check(rng)

    nrows = 1 << args.entries_log2
    nt = 1 << args.table_log2
    nf = nrows // K
    table = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 13, size=(nt, TWR), dtype=np.int64)
        .astype(np.uint32)))
    pidx = rng.integers(0, nt, size=(nrows,), dtype=np.int64).astype(np.int32)
    # Sorted-key structure: ~32-entry runs, like c=16 buckets at 2^20.
    keys = np.sort(rng.integers(0, nrows // 32, size=(nrows,),
                                dtype=np.int64).astype(np.int32))
    pidx_t = jax.device_put(jnp.asarray(pidx.reshape(nf, K).T))
    keys_t = jnp.asarray(keys.reshape(nf, K).T)
    sames_t = jax.device_put(jax.jit(keys_to_sames)(keys_t))
    gidx = jax.device_put(jnp.asarray(pidx))

    xla_gather = jax.jit(lambda tb, ix: tb[ix])
    if args.skip_xla:
        m = float("nan")
    else:
        m = timed(xla_gather, table, gidx)
    print(f"XLA gather [{nrows>>20} M rows x {TWR*4} B]:    {m:7.1f} ms "
          f"({nrows / m / 1e3:.0f} M rows/s)")

    # Everything timed must be jitted: eagerly-dispatched jnp ops each pay
    # the tunnel's per-dispatch round trip (hundreds of ms), swamping the
    # kernel time (first probe run measured the scan at 450 ns/entry eager
    # vs ~10 ns jitted).
    rows = xla_gather(table, gidx).reshape(nf, K, TWR)
    scan_j = jax.jit(lambda r, s: msm_scan_rm_sames(r, s))
    if args.skip_xla:
        m_scan = float("nan")
    else:
        m_scan = timed(scan_j, rows, sames_t)
    print(f"rm+sames scan (pre-gathered rows):  {m_scan:7.1f} ms "
          f"({m_scan * 1e6 / nrows:.1f} ns/entry)")
    print(f"  -> production sum (gather + scan): {m + m_scan:7.1f} ms")
    del rows

    for unroll in args.unrolls:
        dg_j = jax.jit(lambda tb, px, u=unroll: dma_gather(tb, px, u))
        m = timed(dg_j, table, pidx_t)
        print(f"dma-gather only (unroll={unroll}):       {m:7.1f} ms "
              f"({nrows / m / 1e3:.0f} M rows/s, {m * 1e6 / nrows:.1f} ns/row)")

    if not args.skip_fused:
        ds_j = jax.jit(lambda tb, px, sm: msm_scan_dma(tb, px, sm, args.unroll))
        m = timed(ds_j, table, pidx_t, sames_t)
        print(f"dma-scan fused (unroll={args.unroll}):        {m:7.1f} ms "
              f"({m * 1e6 / nrows:.1f} ns/entry)")


def _check(rng):
    """Bit-exactness of the fused kernel vs the production scan, small scale."""
    nrows = LBLK * K * 2
    nt = 4096
    nf = nrows // K
    table = jnp.asarray(rng.integers(0, 1 << 13, size=(nt, TWR),
                                     dtype=np.int64).astype(np.uint32))
    pidx = rng.integers(0, nt, size=(nrows,), dtype=np.int64).astype(np.int32)
    keys = np.sort(rng.integers(0, nrows // 16, size=(nrows,),
                                dtype=np.int64).astype(np.int32))
    pidx_t = jnp.asarray(pidx.reshape(nf, K).T)
    keys_t = jnp.asarray(keys.reshape(nf, K).T)
    sames_t = jax.jit(keys_to_sames)(keys_t)
    want = np.asarray(msm_scan_rm_sames(
        jnp.asarray(table)[jnp.asarray(pidx)].reshape(nf, K, TWR), sames_t))
    got = np.asarray(msm_scan_dma(table, pidx_t, sames_t))
    assert got.shape == want.shape, (got.shape, want.shape)
    bad = np.argwhere(got != want)
    assert bad.size == 0, f"mismatch at {bad[:4]}"
    print("check: dma-scan == rm+sames scan (bit-exact) OK")


if __name__ == "__main__":
    main()
