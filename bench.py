#!/usr/bin/env python3
"""End-to-end MSM benchmark — protocol parity with the reference's
full_benchmarks harness (reference: src/submission/miscellaneous/
full_benchmarks.ts:43-127: one forced-compile run + 5 timed runs per size).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's own headline is its full-MSM wall clock on an Apple
M3 Pro WebGPU at n = 2^20; the in-repo README publishes only the linked
spreadsheet (BASELINE.md), so we pin the commonly cited ~2000 ms as the
baseline constant.  vs_baseline > 1 means faster than the baseline.

Usage: python bench.py [--n LOG2N] [--runs K] [--no-check] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_MS_2E20 = 2000.0  # M3 Pro WebGPU full-MSM at 2^20 (see BASELINE.md)


def log(msg, json_only=False):
    if not json_only:
        print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="log2 of input size")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--chunk-size", type=int, default=None)
    args = ap.parse_args()
    n = 1 << args.n
    jo = args.json_only

    # Build the native oracle if missing (used for input gen + verification).
    lib = os.path.join(REPO, "cpp", "liboracle.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "cpp")], check=True, capture_output=True)

    import numpy as np

    from webgpu_msm_twisted_edwards_tpu.utils import oracle

    log(f"generating {n} points + scalars (native walk)...", jo)
    t0 = time.time()
    pts_u64 = oracle.gen_points(n, seed=20230923)
    rng = np.random.default_rng(42)
    sc_u64 = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.uint64)
    sc_u64[:, 3] &= (1 << 58) - 1  # < 2^250 < subgroup order
    log(f"  inputs ready in {time.time()-t0:.1f}s", jo)

    # Device input layout: [n,2,8] u32 coords, [n,8] u32 scalars (LE).
    coords = pts_u64.view(np.uint32).reshape(n, 2, 8)
    scalars = sc_u64.view(np.uint32).reshape(n, 8)

    import jax
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.models import cuzk
    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
    from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig, default_msm_config, tpu_msm_config

    dev = jax.devices()[0]
    log(f"backend: {jax.default_backend()} device: {dev}", jo)

    if args.chunk_size is not None:
        cfg = MsmConfig(chunk_size=args.chunk_size)
    elif n >= 4096:
        cfg = tpu_msm_config(n)          # Pallas path wins from 4096 up
    else:
        cfg = default_msm_config(n)

    # Device-resident inputs: points are fixed bases in production proving (an
    # SRS), so like the reference we write them to the device once and time
    # the MSM itself (reference protocol: full_benchmarks.ts:43-127; the
    # host->device write here crosses a network tunnel, unlike the
    # reference's local PCIe, so it is staged outside the timed region).

    dcoords = jax.device_put(jnp.asarray(coords))
    dscalars = jax.device_put(jnp.asarray(scalars))
    # Gate on the backend like compute_msm's auto-select: the Pallas kernels
    # compile only for TPU (interpret mode elsewhere is orders slower).
    use_pallas = (
        jax.default_backend() == "tpu" and cfg.chunk_size >= 8 and n >= 4096
    )
    if use_pallas:
        def run_once():
            t = time.time()
            # blocked streams point blocks when n exceeds the device-memory
            # envelope (2^23+); below that it IS the staged pipeline.
            rows = np.asarray(
                MP.msm_window_sums_blocked(dcoords, dscalars, cfg,
                                           interpret=False, fold=True)
            )
            x, y = cuzk.packed_rows_to_extpoints(rows)[0].to_affine()
            return {"x": x, "y": y}, (time.time() - t) * 1000.0
    else:
        def run_once():
            t = time.time()
            res = cuzk.compute_msm(coords, scalars, chunk_size=cfg.chunk_size)
            return res, (time.time() - t) * 1000.0

    log("compile run...", jo)
    res, compile_ms = run_once()
    log(f"  first run (incl. XLA compile): {compile_ms:.0f} ms", jo)

    times = []
    for i in range(args.runs):
        r2, ms = run_once()
        times.append(ms)
        log(f"  run {i+1}: {ms:.1f} ms", jo)
        time.sleep(0.1)
    med = sorted(times)[len(times) // 2]

    ok = None
    if not args.no_check:
        log("verifying vs native oracle...", jo)
        t0 = time.time()
        want = oracle.msm(pts_u64, sc_u64, c=16)
        ok = (res["x"], res["y"]) == want
        log(f"  oracle took {time.time()-t0:.1f}s -> {'MATCH' if ok else 'MISMATCH'}", jo)
        if not ok:
            log(f"  got  {res}", jo)
            log(f"  want {want}", jo)

    # Headline metric: wall-clock per MSM at this size, steady state.
    # The published baseline point is 2^20 only; MSM cost is super-linear at
    # small n (fixed overheads), so vs_baseline is reported only at 2^20
    # rather than scaled linearly (which would overstate it).
    vs_baseline = round(BASELINE_MS_2E20 / med, 3) if args.n == 20 else None
    out = {
        "metric": f"msm_2^{args.n}_wall_ms",
        "value": round(med, 2),
        "unit": "ms",
        "vs_baseline": vs_baseline,
        "compile_ms": round(compile_ms, 1),
        # The first run compiles through a remote helper whose latency varies
        # wildly with service load (observed 136 s .. 1080 s for identical
        # programs on the same day); steady-state runs are unaffected.
        "compile_note": "remote compile service, high variance; stage programs warm-compile in parallel threads (warmup_staged); no persistent cache on this rig",
        "runs_ms": [round(t, 1) for t in times],
        "msm_per_sec": round(1000.0 / med, 3),
        "points_per_sec": round(n / (med / 1000.0)),
        "backend": jax.default_backend(),
        "correct": ok,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
