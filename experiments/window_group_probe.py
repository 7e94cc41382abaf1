"""Probe: one window group vs two at 2^20 (and 2^21) — is the staging cap
still right after the pret layout?

The window-group cap (`ops/msm_pipeline.py::default_window_group`) derives
from `_STAGING_BYTES_PER_ENTRY = 1050`, measured in round 1 when the gather
materialized full [NF*K, 128]-u32 rows.  The round-3 pret layout slices to 64
columns before the transpose; if XLA fuses slice+transpose into the gather,
true staging is nearer ~530 B/entry and 2^20/c=16 fits in ONE group of 16
windows — saving one dispatch chain and any per-group ramp.

Run on TPU (serially — never alongside another TPU process):
    python experiments/window_group_probe.py --power 20 [--runs 3]

Reports first-run + steady-state for window_group in {8, 16} and whether the
forced single group OOMs (caught and reported, not fatal).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from webgpu_msm_twisted_edwards_tpu.models import cuzk  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.utils import oracle  # noqa: E402
from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--power", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--groups", type=int, nargs="+", default=[8, 16])
    args = ap.parse_args()
    n = 1 << args.power
    cfg = MsmConfig(chunk_size=16)

    pts_u64 = oracle.gen_points(n, seed=20230923)
    rng = np.random.default_rng(42)
    sc_u64 = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.uint64)
    sc_u64[:, 3] &= (1 << 58) - 1
    coords = pts_u64.view(np.uint32).reshape(n, 2, 8)
    scalars = sc_u64.view(np.uint32).reshape(n, 8)
    want = oracle.msm(pts_u64, sc_u64, c=16)

    dcoords = jax.device_put(jnp.asarray(coords))
    dscalars = jax.device_put(jnp.asarray(scalars))

    print(f"2^{args.power}, c=16, derived window_group="
          f"{MP.default_window_group(n, cfg.num_windows)}", flush=True)
    for wg in args.groups:
        def one():
            t0 = time.time()
            rows = np.asarray(MP.msm_window_sums_staged(
                dcoords, dscalars, cfg, window_group=wg, fold=True))
            res = cuzk.packed_rows_to_extpoints(rows)[0].to_affine()
            return res, (time.time() - t0) * 1e3
        try:
            res, compile_ms = one()
            ok = res == want
            ts = []
            for _ in range(args.runs):
                ts.append(one()[1])
                time.sleep(0.1)
            med = sorted(ts)[len(ts) // 2]
            print(f"  wg={wg:2d}: first {compile_ms:7.0f} ms   steady "
                  f"{med:6.1f} ms   runs {[round(t,1) for t in ts]}   "
                  f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:  # OOM shows up as XlaRuntimeError
            print(f"  wg={wg:2d}: FAILED — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
