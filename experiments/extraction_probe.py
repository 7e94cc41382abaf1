"""Probe: where do the non-scan milliseconds go in window_group_bucket_sums?

Times the glue stages at production shapes (2^20, one group of 8 windows):
  - searchsorted (bucket starts/counts)
  - extraction gathers (pair rows + carries) + masked add
  - seg_carry_scan
  - the full group program, for the residual

Run on TPU: python experiments/extraction_probe.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.ops.pallas.ec import masked_add_rows  # noqa: E402


def timeit(name, fn, *args, runs=3):
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
    print(f"{name:28s} compile {comp:6.1f}s  run {med:8.1f} ms (incl ~28 ms floor)",
          flush=True)
    return med


def main():
    n = 1 << 20
    wg = 8
    nb = 1 << 15
    rng = np.random.default_rng(0)

    keys_s = jnp.asarray(np.sort(
        rng.integers(0, nb + 1, size=(wg, n), dtype=np.int64).astype(np.int32), axis=1))

    # 1. searchsorted starts/counts (as in the pipeline).
    def ss(keys_s):
        queries = jnp.arange(nb + 1, dtype=jnp.int32)
        offsets = jax.vmap(lambda row: jnp.searchsorted(row, queries, side="left"))(keys_s)
        return offsets

    timeit("searchsorted [8,2^20]x32769", jax.jit(ss), keys_s)

    def ss_sort(keys_s):
        queries = jnp.arange(nb + 1, dtype=jnp.int32)
        return jax.vmap(
            lambda row: jnp.searchsorted(row, queries, side="left", method="sort")
        )(keys_s)

    timeit("searchsorted method='sort'", jax.jit(ss_sort), keys_s)

    # Alternative: histogram via segment_sum over the sorted keys, then
    # cumsum -> offsets.  indices_are_sorted lets XLA lower the scatter as a
    # segmented reduction.
    def seg_counts(keys_s):
        ones = jnp.ones(keys_s.shape, jnp.int32)
        counts = jax.vmap(
            lambda k, o: jax.ops.segment_sum(
                o, k, num_segments=nb + 2, indices_are_sorted=True
            )
        )(keys_s, ones)
        return jnp.cumsum(counts, axis=1)

    timeit("segment_sum histogram+cumsum", jax.jit(seg_counts), keys_s)

    # Round 3: MXU one-hot-matmul histogram (ops/pallas/hist.py) — the
    # destination-grouped formulation the chip actually has hardware for.
    from webgpu_msm_twisted_edwards_tpu.ops.pallas import hist as HG

    for dtype, label in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        for block in (256, 512, 1024):
            def mm(keys_s, dtype=dtype, block=block):
                counts = HG.bucket_counts(keys_s, nb, lanes=block, dtype=dtype,
                                          interpret=False)
                return jnp.cumsum(counts, axis=1) - 1
            timeit(f"matmul hist {label} T={block}", jax.jit(mm), keys_s)

    # 2. extraction pair-row gather + half select + masked add.
    nf = wg * n // PS.K
    t2d = jnp.asarray(rng.integers(0, 1 << 13, size=(nf * PS.K // 2, 2 * PS.TW),
                                   dtype=np.int64).astype(np.uint32))
    flat_end = jnp.asarray(rng.integers(0, wg * n, size=(wg * nb,), dtype=np.int64).astype(np.int32))
    carries = jnp.asarray(rng.integers(0, 1 << 13, size=(nf, PS.TW),
                                       dtype=np.int64).astype(np.uint32))
    gfrag = jnp.asarray(rng.integers(0, nf, size=(wg * nb,), dtype=np.int64).astype(np.int32))
    mask = jnp.asarray(rng.integers(0, 2, size=(wg * nb,), dtype=np.int64).astype(np.int32))

    def extract(t2d, flat_end, carries, gfrag, mask):
        pair_rows = t2d[flat_end >> 1]
        odd = (flat_end & 1) == 1
        tval = jnp.where(odd[:, None], pair_rows[:, PS.TW:], pair_rows[:, :PS.TW])
        cval = carries[gfrag]
        return masked_add_rows(tval, cval, mask)

    timeit("extract gathers+masked_add", jax.jit(extract), t2d, flat_end, carries, gfrag, mask)

    # 3. carry scan over nf fragments.
    a = jnp.asarray(rng.integers(0, 2, size=(nf,), dtype=np.int64).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 13, size=(nf, PS.TW), dtype=np.int64).astype(np.uint32))
    timeit("seg_carry_scan [131072]", jax.jit(partial(PS.seg_carry_scan, kab=PS.K)), a, b)

    # 4. the full group program for the residual (doubled pre-negated table).
    table = jnp.asarray(rng.integers(0, 1 << 13, size=(2 * n, PS.TWR), dtype=np.int64).astype(np.uint32))
    digits_g = jnp.asarray(rng.integers(-(nb), nb, size=(wg, n), dtype=np.int64).astype(np.int32))
    grp = jax.jit(partial(MP.window_group_bucket_sums, nb=nb, interpret=False))
    timeit("full window_group program", grp, table, digits_g)


if __name__ == "__main__":
    main()
