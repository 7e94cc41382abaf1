"""Probe: destination-grouped row movement — prove or break the "~80 M rows/s
permutation is a hardware constant" claim (VERDICT r2 next-round #2).

Every round-1/2 row mover measured moves ONE row per descriptor or per
dynamic VMEM copy: XLA gather ~76-80 M rows/s, per-row async DMA 31-36 M/s
(the ~28 ns scalar-core issue floor), VMEM dynamic copy ~54 M/s at 64 MB
tables.  The one unmeasured scheme amortizes descriptors by grouping rows by
DESTINATION: route each row into a per-bin VMEM staging tile (bin = high
bits of its key) and flush full 64-row tiles with a single DMA each —
descriptor cost drops 64x; the per-row routing copy becomes the bound.

This kernel implements exactly that routing loop:
    per row: read bin id (SMEM), bump its counter (SMEM), copy the row into
    staging[bin] (dynamic-index VMEM write), and on a full tile start an
    async DMA staging[bin] -> out[bin region] (double-buffered per bin).

Measured rows/s goes in docs/MEASUREMENTS.md either way: >~120 M rows/s
would cut the 164 ms gather stage at 2^20; <= 80 M earns the "hardware
constant" conclusion for real.

Run on TPU: python experiments/partition_probe.py [--n 1048576] [--bins 64]
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

ROWW = 128      # row width in u32 (the production table row)
TILE = 64       # rows per staging tile / per flush DMA


def _partition_kernel(nbins, tblk, cap, bins_ref, rows_ref, out_ref,
                      staging_ref, counters_ref, sems_ref):
    """One grid step routes tblk rows.  staging: [nbins*2*TILE, ROWW] VMEM
    (2 tiles per bin, double-buffered); counters: [nbins] SMEM int32 holding
    the per-bin total row count so far; out: [nbins*cap, ROWW] in HBM-like
    memory, written only by DMA flushes."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        def zero(b, _):
            counters_ref[b] = 0
            return 0
        jax.lax.fori_loop(0, nbins, zero, 0, unroll=False)

    def body(e, _):
        b = bins_ref[0, e]
        cnt = counters_ref[b]
        slot = cnt % TILE
        buf = (cnt // TILE) % 2
        # Route the row into its bin's active staging tile.
        staging_ref[pl.ds(b * (2 * TILE) + buf * TILE + slot, 1), :] = (
            rows_ref[pl.ds(e, 1), :]
        )
        counters_ref[b] = cnt + 1

        @pl.when(slot == TILE - 1)
        def _():
            # Full tile: flush with ONE descriptor; wait for this buffer's
            # previous flush first (double-buffered, so routing into the
            # other tile proceeds while this DMA drains).
            tile_idx = cnt // TILE
            dma = pltpu.make_async_copy(
                staging_ref.at[pl.ds(b * (2 * TILE) + buf * TILE, TILE), :],
                out_ref.at[pl.ds(b * cap + tile_idx * TILE, TILE), :],
                sems_ref.at[b],
            )

            @pl.when(tile_idx >= 2)
            def _():
                pltpu.make_async_copy(
                    staging_ref.at[pl.ds(b * (2 * TILE) + buf * TILE, TILE), :],
                    out_ref.at[pl.ds(b * cap, TILE), :],
                    sems_ref.at[b],
                ).wait()

            dma.start()

        return 0

    jax.lax.fori_loop(0, tblk, body, 0, unroll=False)

    # Final grid step: drain every outstanding flush DMA (each flush waits
    # only for the one two-before it, so up to min(2, flushes) per bin are
    # still in flight — leaving them un-waited at kernel exit is a semaphore
    # leak that kills the device).  Tail tiles (< TILE rows) stay unflushed:
    # this probe measures steady-state routing + flush throughput, not a
    # complete partition.
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        def drain(b, _):
            flushes = counters_ref[b] // TILE

            def wait_one(i, _):
                pltpu.make_async_copy(
                    staging_ref.at[pl.ds(b * (2 * TILE), TILE), :],
                    out_ref.at[pl.ds(b * cap, TILE), :],
                    sems_ref.at[b],
                ).wait()
                return 0

            jax.lax.fori_loop(0, jnp.minimum(flushes, 2), wait_one, 0,
                              unroll=False)
            return 0

        jax.lax.fori_loop(0, nbins, drain, 0, unroll=False)


def partition(rows, bins, nbins, tblk=4096, interpret=False):
    n = rows.shape[0]
    cap = (n // nbins) * 2
    grid = (n // tblk,)
    return pl.pallas_call(
        partial(_partition_kernel, nbins, tblk, cap),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tblk), lambda g: (0, g), memory_space=pltpu.SMEM),
            pl.BlockSpec((tblk, ROWW), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((nbins * cap, ROWW), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((nbins * 2 * TILE, ROWW), jnp.uint32),
            pltpu.SMEM((nbins,), jnp.int32),
            pltpu.SemaphoreType.DMA((nbins,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(bins.reshape(1, -1), rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--bins", type=int, default=64)
    ap.add_argument("--tblk", type=int, default=4096)
    args = ap.parse_args()
    n, nbins = args.n, args.bins

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 1 << 13, size=(n, ROWW),
                                    dtype=np.int64).astype(np.uint32))
    bins = jnp.asarray(rng.integers(0, nbins, size=(n,),
                                    dtype=np.int64).astype(np.int32))

    fn = jax.jit(partial(partition, nbins=nbins, tblk=args.tblk))
    t0 = time.time()
    out = fn(rows, bins)
    jax.device_get(out[:1, :1])
    print(f"compile: {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(rows, bins)
        jax.device_get(out[:1, :1])
        ts.append((time.time() - t0) * 1e3)
    med = sorted(ts)[1]
    rate = n / ((med - 28) * 1e-3) / 1e6
    print(f"partition {n} rows into {nbins} bins: {med:.1f} ms "
          f"-> {rate:.0f} M rows/s (XLA gather reference: ~80 M rows/s)",
          flush=True)


if __name__ == "__main__":
    main()
