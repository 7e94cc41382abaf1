"""Probe: c=17 / 15-window decomposition vs the production c=16 / 16 windows
at 2^20 (round 4 continuation).

With scalars reduced below the subgroup order (< 2^253, the MSM contract and
what the reference assumes, submission.ts:79-83), a 17-bit signed window
decomposition covers 255 bits in 15 windows — one fewer than c=16 over 256
bits.  That cuts every entry-linear stage (scan, gather, sort: together
~326 ms of the 411 ms wall) by 6.25%, but doubles the per-bucket space
(W*nb: 15*2^16 vs 16*2^15), growing BPR and extraction.  Whether it nets out
depends on how dispatch/overhead-dominated the per-bucket stages are (BPR's
17 ms is ~4 ms of madd compute) — so: measure.

Run (TPU, serialized with other TPU work):
    python -m experiments.c17_probe [--power 20] [--runs 3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from webgpu_msm_twisted_edwards_tpu.benchmarks.full import _inputs_for_power
from webgpu_msm_twisted_edwards_tpu.models import cuzk
from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--power", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", "this probe times the TPU path"
    coords, scalars, expected, src = _inputs_for_power(args.power)
    dcoords = jax.device_put(jnp.asarray(coords))
    dscalars = jax.device_put(jnp.asarray(scalars))
    print(f"n=2^{args.power} inputs ready ({src})", flush=True)

    configs = [
        ("c=16 W=16 (production)", MsmConfig(chunk_size=16)),
        ("c=17 W=15 (253-bit scalars)", MsmConfig(chunk_size=17, scalar_bits=255)),
    ]
    for label, cfg in configs:
        def one_run():
            t0 = time.time()
            rows = np.asarray(
                MP.msm_window_sums_blocked(dcoords, dscalars, cfg, fold=True))
            x, y = cuzk.packed_rows_to_extpoints(rows)[0].to_affine()
            return (x, y), (time.time() - t0) * 1e3

        t0 = time.time()
        res, _ = one_run()
        compile_s = time.time() - t0
        ok = (expected is None) or (res == tuple(expected))
        ts = []
        for _ in range(args.runs):
            ts.append(one_run()[1])
            time.sleep(0.1)
        med = sorted(ts)[len(ts) // 2]
        print(f"{label}: {med:.1f} ms median {['MISMATCH', 'MATCH'][ok]} "
              f"(runs {[round(t, 1) for t in ts]}, first incl. compile "
              f"{compile_s:.1f} s)", flush=True)
        assert ok, (label, "MISMATCH vs oracle")


if __name__ == "__main__":
    main()
