"""Probe: table-row width under the DMA gather (VERDICT r4 #7).

TWR=128 (512 B rows) was chosen when the XLA gather punished narrow rows
(ops/pallas/scan.py:44-48: TWR=64 cost +12 ms at 2^20 and doubled compile
time).  The production gather now runs on the DMA engines at ~9.4 ns/row of
descriptor issue (54 GB/s — 7% of v5e HBM bandwidth), so IF the issue rate
dominates, a 256 B row would gather in the same time and halve the table +
gather-output HBM footprint (streaming and fixed-base headroom, bigger
window groups at 2^22).

Two things to establish:
  1. Does a [N, 64] u32 HBM array actually OCCUPY half the bytes of
     [N, 128]?  TPU HBM arrays are tiled; if the (8, 128) lane tiling pads
     the minor dim to 128, a TWR=64 table saves nothing physically — the
     decisive question, answered with device memory_stats.
  2. DMA-gather + XLA-gather rates at row widths 128 / 64 / 32 u32.

Run on TPU:  python experiments/row_width_probe.py [--entries-log2 23]
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

from webgpu_msm_twisted_edwards_tpu.ops.pallas.gather import dma_row_gather
from webgpu_msm_twisted_edwards_tpu.ops.pallas.scan import K


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def timed(fn, *args, runs=5):
    t0 = time.time()
    _force(fn(*args))
    print(f"    (first run incl. compile: {time.time() - t0:.1f} s)")
    ts = []
    for _ in range(runs):
        t0 = time.time()
        _force(fn(*args))
        ts.append((time.time() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def live_bytes() -> int | None:
    try:
        return jax.devices()[0].memory_stats()["bytes_in_use"]
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries-log2", type=int, default=23)
    ap.add_argument("--table-log2", type=int, default=21)
    ap.add_argument("--widths", type=int, nargs="*", default=[128, 64, 32])
    args = ap.parse_args()

    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(0)
    nrows = 1 << args.entries_log2
    nt = 1 << args.table_log2
    nf = nrows // K
    pidx = rng.integers(0, nt, size=(nrows,), dtype=np.int64).astype(np.int32)
    pidx_t = jax.device_put(jnp.asarray(pidx.reshape(nf, K).T))
    gidx = jax.device_put(jnp.asarray(pidx))

    for w in args.widths:
        host = rng.integers(0, 1 << 13, size=(nt, w), dtype=np.int64).astype(np.uint32)
        b0 = live_bytes()
        table = jax.device_put(jnp.asarray(host))
        _force(table)
        b1 = live_bytes()
        phys = None if b0 is None else b1 - b0
        logical = nt * w * 4
        note = "?" if phys is None else f"{phys / 1e6:.0f} MB physical"
        print(f"width {w:4d} u32 ({w*4} B/row): logical {logical/1e6:.0f} MB, {note}"
              + ("" if phys is None or abs(phys - logical) < logical * 0.05
                 else "  <-- TILING PADS THE MINOR DIM"))

        m = timed(jax.jit(lambda tb, ix: tb[ix]), table, gidx)
        print(f"  XLA gather: {m:7.1f} ms ({nrows / m / 1e3:.0f} M rows/s)")
        try:
            m = timed(jax.jit(lambda tb, px: dma_row_gather(tb, px)), table, pidx_t)
            print(f"  DMA gather: {m:7.1f} ms ({nrows / m / 1e3:.0f} M rows/s, "
                  f"{m * 1e6 / nrows:.1f} ns/row)")
        except Exception as e:  # Mosaic rejects <128-lane row slices
            print(f"  DMA gather: FAILS TO COMPILE — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
        del table


if __name__ == "__main__":
    main()
