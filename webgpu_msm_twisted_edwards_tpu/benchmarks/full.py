"""End-to-end MSM benchmark over powers 2^16..2^20.

Protocol parity with the reference driver (reference:
src/submission/miscellaneous/full_benchmarks.ts:43-161): per power, one
forced-recompile run then `runs` timed runs with 100 ms gaps, assembled into
a Markdown table that separates first-run (compile) from steady state;
results checked against the ZPrize fixtures when present, else the native
oracle (the reference similarly adopts the WASM result as ground truth for
random inputs, reference: AllBenchmarks.tsx:53-55).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from ..utils import oracle, test_data
from ..utils.params import MsmConfig, tpu_msm_config
from .timing import Table, median

#: Checked-in previous-round steady-state curve (ms per power) — the
#: round-over-round regression reference (VERDICT r4 #1: the 2^22/2^16
#: round-4 regressions shipped silently because nothing diffed the curve).
#: Refresh with `full.run(..., save_baseline=True)` after an intentional
#: perf change.
_CURVE_BASELINE = os.path.join(os.path.dirname(__file__), "curve_baseline.json")

#: Relative slowdown vs the recorded curve that counts as a regression.
_REGRESSION_TOL = 0.03


def load_curve_baseline(path: str | None = None) -> dict | None:
    """{"device_kind": ..., "curve": {"<power>": ms}} or None if absent."""
    try:
        with open(path or _CURVE_BASELINE) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def save_curve_baseline(curve: dict[int, float], device_kind: str,
                        path: str | None = None) -> None:
    data = {"device_kind": device_kind,
            "curve": {str(p): round(ms, 1) for p, ms in curve.items()}}
    with open(path or _CURVE_BASELINE, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
        fh.write("\n")


def check_regressions(curve: dict[int, float], device_kind: str,
                      path: str | None = None,
                      tol: float = _REGRESSION_TOL) -> list[str]:
    """Compare measured steady-state medians against the checked-in
    previous-round curve; returns one warning line per power slower by more
    than `tol`.  Skips silently when no baseline exists or the hardware
    differs (CPU CI runs must not diff against TPU numbers)."""
    base = load_curve_baseline(path)
    if not base or base.get("device_kind") != device_kind:
        return []
    warnings = []
    for p, ms in sorted(curve.items()):
        ref = base["curve"].get(str(p))
        if ref and ms > ref * (1 + tol):
            warnings.append(
                f"REGRESSION 2^{p}: {ms:.1f} ms vs recorded {ref:.1f} ms "
                f"(+{(ms / ref - 1) * 100:.1f}%, tol {tol * 100:.0f}%)"
            )
    return warnings


def _inputs_for_power(p: int, seed: int = 20230923, base_dir: str | None = None):
    """Fixture inputs if available, else deterministic native-walk inputs."""
    if test_data.available(p, base_dir):
        tc = test_data.load_test_case(p, base_dir)
        coords = np.zeros((len(tc.points), 2, 8), dtype=np.uint32)
        for i, (x, y) in enumerate(tc.points):
            for jw in range(8):
                coords[i, 0, jw] = (x >> (32 * jw)) & 0xFFFFFFFF
                coords[i, 1, jw] = (y >> (32 * jw)) & 0xFFFFFFFF
        sc = np.zeros((len(tc.scalars), 8), dtype=np.uint32)
        for i, s in enumerate(tc.scalars):
            for jw in range(8):
                sc[i, jw] = (s >> (32 * jw)) & 0xFFFFFFFF
        return coords, sc, tc.expected, "fixture"
    if not oracle.available():
        raise RuntimeError(
            f"no fixture for 2^{p} and the native oracle is not built "
            "(make -C cpp); cannot generate inputs"
        )
    n = 1 << p
    pts_u64 = oracle.gen_points(n, seed=seed)
    rng = np.random.default_rng(42)
    sc_u64 = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.uint64)
    sc_u64[:, 3] &= (1 << 58) - 1
    coords = pts_u64.view(np.uint32).reshape(n, 2, 8)
    scalars = sc_u64.view(np.uint32).reshape(n, 8)
    expected = oracle.msm(pts_u64, sc_u64, c=16)
    return coords, scalars, expected, "native walk"


def run(powers=(16, 17, 18, 19, 20), runs: int = 5, csv_path: str | None = None,
        check: bool = True, base_dir: str | None = None,
        save_baseline: bool = False) -> Table:
    import jax
    import jax.numpy as jnp

    from ..cpu.mirrors import horner
    from ..models import cuzk
    from ..ops import msm_pipeline as MP
    from ..utils.params import default_msm_config

    device_kind = jax.devices()[0].device_kind
    base = load_curve_baseline()
    diff_col = bool(base and base.get("device_kind") == device_kind)
    table = Table(["n", "inputs", "first run incl. compile (ms)",
                   "median steady (ms)", "runs (ms)", "vs recorded", "correct"])
    curve: dict[int, float] = {}
    for p in powers:
        coords, scalars, expected, src = _inputs_for_power(p, base_dir=base_dir)
        n = coords.shape[0]
        # Same auto-select as compute_msm: staged Pallas pipeline on TPU,
        # the pure-XLA pipeline elsewhere / at small n.
        on_tpu = jax.default_backend() == "tpu"
        cfg = tpu_msm_config(n) if on_tpu and n >= 4096 else default_msm_config(n)
        use_pallas = on_tpu and cfg.chunk_size >= 8 and n >= 4096
        dcoords = jax.device_put(jnp.asarray(coords))
        dscalars = jax.device_put(jnp.asarray(scalars))
        if use_pallas:
            # The production dispatch (models/cuzk.py::compute_msm): blocked
            # IS the staged pipeline below the device-memory envelope and
            # streams point blocks above it (2^23+ on a 16 GB chip — the
            # direct staged call RESOURCE_EXHAUSTs there).
            fn = lambda c, s: MP.msm_window_sums_blocked(c, s, cfg, fold=True)

            def one_run():
                t0 = time.time()
                rows = np.asarray(fn(dcoords, dscalars))
                x, y = cuzk.packed_rows_to_extpoints(rows)[0].to_affine()
                return (x, y), (time.time() - t0) * 1e3
        else:
            jfn = cuzk._jitted_pipeline(cfg.chunk_size, 256 if cfg.chunk_size >= 8 else 4)

            def one_run():
                t0 = time.time()
                sums = jfn(dcoords, dscalars)
                sums = jax.tree_util.tree_map(np.asarray, sums)
                pts = cuzk.window_sums_to_extpoints(sums)
                total = horner(pts, cfg.chunk_size)
                x, y = total.to_affine()
                return (x, y), (time.time() - t0) * 1e3

        res, compile_ms = one_run()
        ts = []
        for _ in range(runs):
            r2, ms = one_run()
            ts.append(ms)
            time.sleep(0.1)
        ok = "-"
        if check and expected is not None:
            ok = "yes" if res == tuple(expected) else "NO"
        m = median(ts)
        curve[p] = m
        vs = "-"
        if diff_col and base["curve"].get(str(p)):
            ref = base["curve"][str(p)]
            vs = f"{(m / ref - 1) * 100:+.1f}%"
        table.add(f"2^{p}", src, round(compile_ms), round(m, 1),
                  [round(t, 1) for t in ts], vs, ok)
        print(table.markdown().splitlines()[-1], flush=True)
    for line in check_regressions(curve, device_kind):
        print(line, flush=True)
    if save_baseline:
        save_curve_baseline(curve, device_kind)
    if csv_path:
        table.save_csv(csv_path)
    return table


def sweep(powers=(18, 19, 20), chunks=(13, 14, 15, 16), runs: int = 3,
          base_dir: str | None = None) -> Table:
    """Window-size sweep on hardware: steady-state ms for each (n, c) pair —
    the measured basis of `utils.params.tpu_msm_config` (re-run whenever the
    pipeline's fixed per-bucket costs change; see docs/DESIGN.md §5
    "Window-size tuning").  TPU-only (the Pallas path)."""
    import jax
    import jax.numpy as jnp

    from ..cpu.mirrors import horner
    from ..models import cuzk
    from ..ops import msm_pipeline as MP

    assert jax.default_backend() == "tpu", "sweep times the TPU Pallas path"
    table = Table(["n"] + [f"c={c} (ms)" for c in chunks] + ["winner"])
    for p in powers:
        coords, scalars, expected, _src = _inputs_for_power(p, base_dir=base_dir)
        dcoords = jax.device_put(jnp.asarray(coords))
        dscalars = jax.device_put(jnp.asarray(scalars))
        row = []
        for c in chunks:
            cfg = MsmConfig(chunk_size=c)

            def one_run():
                # blocked falls through to the plain staged pipeline below the
                # memory envelope, so this times the production path at every
                # n including the 2^23+ streaming sizes (VERDICT r3 #7).
                t0 = time.time()
                rows = np.asarray(
                    MP.msm_window_sums_blocked(dcoords, dscalars, cfg, fold=True))
                x, y = cuzk.packed_rows_to_extpoints(rows)[0].to_affine()
                return (x, y), (time.time() - t0) * 1e3
            res, _compile = one_run()
            if expected is not None:
                assert res == tuple(expected), (p, c, "MISMATCH vs oracle")
            ts = []
            for _ in range(runs):
                ts.append(one_run()[1])
                time.sleep(0.1)
            row.append(round(sorted(ts)[len(ts) // 2], 1))
        best = chunks[int(np.argmin(row))]
        table.add(f"2^{p}", *row, f"c={best}")
        print(table.markdown().splitlines()[-1], flush=True)
    return table


def run_batch(power: int = 18, k: int = 4, check: bool = True,
              base_dir: str | None = None, resident: bool = False,
              precompute: bool = False, pre_chunk: int | None = None) -> Table:
    """Batch-MSM benchmark: ONE point set, `k` scalar vectors — the
    fixed-SRS proving pattern compute_msm_batch exists for.

    Reports ms/MSM two ways, with what each includes spelled out:
      - batch   : one compute_msm_batch call / k.  Stages the points and
                  builds the Montgomery table ONCE; all device dispatches
                  are issued before any result is fetched, so host Horner of
                  MSM i overlaps device work of MSM i+1.
      - one-shot: k sequential compute_msm calls / k.  Every call re-stages
                  the point coordinates host->device (16 MB at 2^18 — over
                  this rig's ~40 MB/s tunnel that alone is ~0.4 s/call),
                  rebuilds the table on device, and serializes readback +
                  host Horner between MSMs.

    Both paths are timed after a warm-up call, so XLA compiles are excluded
    from both numbers (the reference's recompile-vs-steady split,
    full_benchmarks.ts:61-74).

    resident=True pre-stages points and scalars on the device (jax arrays —
    compute_msm accepts device-resident inputs first-class) so both columns
    measure device work + readback only.  This is the production-relevant
    comparison on rigs where host->device bandwidth is scarce: with host
    inputs on this rig's ~40 MB/s tunnel, both columns are dominated by the
    64 MB-per-call coordinate transfer at 2^20 and the comparison measures
    the tunnel, not the engine."""
    import jax
    import jax.numpy as jnp

    from ..models import cuzk

    coords, sc, _expected, src = _inputs_for_power(power, base_dir=base_dir)
    rng = np.random.default_rng(7)
    scs = [sc] + [rng.permutation(sc, axis=0) for _ in range(k - 1)]
    np_scs = scs
    if resident:
        coords = jax.device_put(jnp.asarray(coords))
        scs = [jax.device_put(jnp.asarray(s_)) for s_ in scs]
        src = src + " (device-resident)"

    # Warm-up / compile (both entry points share the staged jit caches).
    res_batch = cuzk.compute_msm_batch(coords, scs)
    _ = cuzk.compute_msm(coords, scs[0])

    t0 = time.time()
    res_batch = cuzk.compute_msm_batch(coords, scs)
    batch_ms = (time.time() - t0) * 1e3 / k

    t0 = time.time()
    res_one = [cuzk.compute_msm(coords, s) for s in scs]
    oneshot_ms = (time.time() - t0) * 1e3 / k

    pre_ms = setup_s = None
    res_pre = None
    if precompute:
        # Fixed-SRS mode: one-time window-shifted table (ops/precompute.py),
        # then merged single-window MSMs.  Setup time includes its compiles
        # (one-time per SRS); the per-MSM number is steady-state like the
        # other two columns.
        t0 = time.time()
        pre = cuzk.precompute_msm_base(coords, chunk_size=pre_chunk)
        res_pre = cuzk.compute_msm_batch_precomputed(pre, scs)   # warm-up
        setup_s = time.time() - t0
        t0 = time.time()
        res_pre = cuzk.compute_msm_batch_precomputed(pre, scs)
        pre_ms = (time.time() - t0) * 1e3 / k

    ok = "-"
    if check:
        same = all(a == b for a, b in zip(res_batch, res_one))
        if res_pre is not None:
            same = same and all(a == b for a, b in zip(res_batch, res_pre))
        ok = "yes" if same else "NO"
        if same and oracle.available():
            # Spot-check one vector against the independent native oracle
            # (u32 LE words reinterpret directly as the oracle's u64 layout).
            pts_u64 = np.ascontiguousarray(np.asarray(coords)).view(np.uint64).reshape(-1, 8)
            sc_u64 = np.ascontiguousarray(np_scs[1]).view(np.uint64).reshape(-1, 4)
            want = oracle.msm(pts_u64, sc_u64)
            ok = "yes" if (res_batch[1]["x"], res_batch[1]["y"]) == want else "NO"

    cols = ["n", "k", "inputs", "batch (ms/MSM)", "one-shot (ms/MSM)",
            "speedup", "correct"]
    row = [f"2^{power}", k, src, round(batch_ms, 1), round(oneshot_ms, 1),
           f"{oneshot_ms / batch_ms:.2f}x", ok]
    if precompute:
        cols[6:6] = ["precomp (ms/MSM)", "setup (s)"]
        row[6:6] = [round(pre_ms, 1), round(setup_s, 1)]
    table = Table(cols)
    table.add(*row)
    return table
