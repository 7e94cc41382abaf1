"""Probe: XLA row-gather rate vs TABLE SIZE at production shapes.

The production pipeline gathers 8*2^20 rows per window group from the
pre-negated DOUBLED table (2n = 2^21 rows x 512 B = 1 GB at 2^20), but the
stages micro-bench measures the gather from an n-row table.  MEASUREMENTS.md
records the gather rate as "74-98 M rows/s depending on table size" — if the
2^21-row table gathers measurably slower than a 2^20-row one, moving the
signed-digit negation back INTO the scan kernel (sign bit rides the hoisted
sames word; cost ~= one select + one borrow-free 4p-v per entry) buys the
difference on 16.8 M gathered rows.

Run on TPU:  python experiments/table_size_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 64
LBLK = 256
TWR = 128


def _force(out):
    # block_until_ready does not block through the axon tunnel; force with a
    # 1-element device_get (CLAUDE.md) — NEVER np.asarray (40 MB/s tunnel).
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def timed(fn, *args, runs=5):
    _force(fn(*args))  # compile
    ts = []
    for _ in range(runs):
        t0 = time.time()
        _force(fn(*args))
        ts.append((time.time() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 1 << 20
    wg = 8
    nrows = wg * n
    gidx_small = jax.device_put(jnp.asarray(
        rng.integers(0, n, size=(nrows,), dtype=np.int64).astype(np.int32)))
    gidx_big = jax.device_put(jnp.asarray(
        rng.integers(0, 2 * n, size=(nrows,), dtype=np.int64).astype(np.int32)))

    gather = jax.jit(lambda tb, ix: tb[ix])

    nf = nrows // K

    def gather_t(tb, ix):
        r = tb[ix].reshape(nf // LBLK, LBLK, K, TWR)[:, :, :, :64]
        return jnp.transpose(r, (0, 2, 3, 1))

    gather_t_fn = jax.jit(gather_t)

    for rows_log2 in (20, 21):
        tbl = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 13, size=(1 << rows_log2, TWR),
                         dtype=np.int64).astype(np.uint32)))
        gidx = gidx_small if rows_log2 == 20 else gidx_big
        m = timed(gather, tbl, gidx)
        print(f"gather        table=2^{rows_log2} rows: {m:7.1f} ms  "
              f"({nrows / m / 1e3:.0f} M rows/s)")
        m = timed(gather_t_fn, tbl, gidx)
        print(f"gather+transp table=2^{rows_log2} rows: {m:7.1f} ms  "
              f"({nrows / m / 1e3:.0f} M rows/s)")
        del tbl


if __name__ == "__main__":
    main()
