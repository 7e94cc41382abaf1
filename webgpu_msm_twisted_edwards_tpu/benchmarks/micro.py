"""Per-stage micro-benchmarks.

One function per benchmark, mirroring the reference's miscellaneous suite
(reference files in src/submission/miscellaneous/):

| here              | reference                                   |
|-------------------|---------------------------------------------|
| mont_mul          | mont_mul_benchmarks.ts:27-242 (limb 12-16)  |
| barrett_mul       | barrett_mul_benchmarks.ts                   |
| barrett_domb_mul  | barrett_domb_mul_benchmarks.ts              |
| convert_inputs    | convert_inputs_into_mont_benchmarks.ts      |
| decompose_scalars | decompose_scalars_benchmark.ts              |
| data_transfer     | data_transfer_cost_benchmarks.ts:16         |
| add_points        | add_points_benchmarks.ts:80                 |
| scalar_mul        | scalar_mul_benchmarks.ts (dbl-add vs Booth) |
| bucket_reduction  | bucket_points_reduction_benchmark.ts        |
| horners_rule      | horners_rule_benchmark.ts (GPU vs CPU)      |
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

from ..utils.params import PARAMS, MsmConfig
from .timing import Table, median, time_device


def _rand_limbs(rng, batch, params):
    return rng.integers(0, 1 << params.word_size, size=(batch, params.num_words),
                        dtype=np.uint32)


def mont_mul(batch: int = 1 << 17, chain: int = 16, runs: int = 3) -> Table:
    """Limb-width sweep 12-16 of chained Montgomery products — the study
    behind the w=13 design choice (reference: README.md:400-428)."""
    import jax.numpy as jnp

    from ..ops.montgomery_variants import cost_loop, mont_mul_for_width

    rng = np.random.default_rng(0)
    table = Table(["limb width", "algorithm", "num words",
                   f"{chain} chained muls x {batch} lanes: compile (ms)",
                   "median run (ms)", "M mont/s"])
    for w in (12, 13, 14, 15, 16):
        params, _ = mont_mul_for_width(w)
        algo = ("optimised (carry-free)" if params.nsafe >= params.num_words
                else ("modified" if params.nsafe >= 1 else "CIOS"))
        _, fn = cost_loop(w, batch, chain)
        x = jnp.asarray(_rand_limbs(rng, batch, params))
        y = jnp.asarray(_rand_limbs(rng, batch, params))
        comp, ts = time_device(fn, x, y, runs=runs)
        m = median(ts)
        table.add(w, algo, params.num_words, round(comp), round(m, 2),
                  round(batch * chain / m / 1e3, 1))
    return table


def barrett_mul(batch: int = 1 << 17, runs: int = 3) -> Table:
    import jax
    import jax.numpy as jnp

    from ..ops.barrett import barrett_mul as bmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(_rand_limbs(rng, batch, PARAMS))
    y = jnp.asarray(_rand_limbs(rng, batch, PARAMS))
    fn = jax.jit(partial(bmul, params=PARAMS))
    comp, ts = time_device(fn, x, y, runs=runs)
    t = Table(["batch", "compile (ms)", "median (ms)", "M mul/s"])
    t.add(batch, round(comp), round(median(ts), 2), round(batch / median(ts) / 1e3, 1))
    return t


def barrett_domb_mul(batch: int = 1 << 17, runs: int = 3, samples: int = 2000) -> Table:
    """Device Barrett-Domb rate next to Barrett and Montgomery (the
    reference's barrett_domb_mul_benchmarks.ts raced the same three), plus
    the CPU-mirror timing row."""
    import random

    import jax
    import jax.numpy as jnp

    from ..cpu.barrett_domb import barrett_domb_mul_int
    from ..ops.barrett import barrett_mul as bmul
    from ..ops.barrett_domb import barrett_domb_mul as bdmul
    from ..ops.field import mont_mul as xmont

    rng = np.random.default_rng(0)
    x = jnp.asarray(_rand_limbs(rng, batch, PARAMS))
    y = jnp.asarray(_rand_limbs(rng, batch, PARAMS))
    t = Table(["algorithm", "batch", "compile (ms)", "median (ms)", "M mul/s"])
    for name, fn in (
        ("barrett-domb (device)", jax.jit(partial(bdmul, params=PARAMS))),
        ("barrett (device)", jax.jit(partial(bmul, params=PARAMS))),
        ("montgomery (device, XLA)", jax.jit(partial(xmont, params=PARAMS))),
    ):
        comp, ts = time_device(fn, x, y, runs=runs)
        m = median(ts)
        t.add(name, batch, round(comp), round(m, 2), round(batch / m / 1e3, 1))

    r = random.Random(0)
    xs = [r.randrange(0, PARAMS.p) for _ in range(samples)]
    ys = [r.randrange(0, PARAMS.p) for _ in range(samples)]
    t0 = time.time()
    for xi, yi in zip(xs, ys):
        barrett_domb_mul_int(xi, yi)
    dt = (time.time() - t0) * 1e3
    t.add("barrett-domb (cpu mirror)", samples, "-", round(dt, 1),
          round(samples / dt / 1e3, 4))
    return t


def convert_inputs(batch: int = 1 << 18, runs: int = 3) -> Table:
    """Point conversion into Montgomery limb form (reference:
    convert_inputs_into_mont_benchmarks.ts)."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas import convert as PC

    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1 << 32, size=(batch, 2, 8), dtype=np.uint64).astype(np.uint32)
    coords[:, :, 7] = 0
    fn = jax.jit(partial(PC.build_table, interpret=None))
    comp, ts = time_device(fn, jnp.asarray(coords), runs=runs)
    t = Table(["points", "compile (ms)", "median (ms)", "M points/s"])
    t.add(batch, round(comp), round(median(ts), 2), round(batch / median(ts) / 1e3, 1))
    return t


def decompose_scalars(batch: int = 1 << 20, runs: int = 3) -> Table:
    import jax
    import jax.numpy as jnp

    from ..ops import convert as CV

    rng = np.random.default_rng(0)
    sc = rng.integers(0, 1 << 32, size=(batch, 8), dtype=np.uint64).astype(np.uint32)
    cfg = MsmConfig(chunk_size=16)
    fn = jax.jit(partial(CV.decompose_scalars_signed, cfg=cfg))
    comp, ts = time_device(fn, jnp.asarray(sc), runs=runs)
    t = Table(["scalars", "compile (ms)", "median (ms)", "M scalars/s"])
    t.add(batch, round(comp), round(median(ts), 2), round(batch / median(ts) / 1e3, 1))
    return t


def data_transfer(mb: int = 64, runs: int = 3) -> Table:
    """Host->device and device->host bandwidth (reference:
    data_transfer_cost_benchmarks.ts:16).  On this rig the link is a network
    tunnel; on a directly attached TPU this measures PCIe/DMA."""
    import jax

    n = mb * (1 << 20) // 4
    host = np.arange(n, dtype=np.uint32)
    t = Table(["direction", "MB", "median (ms)", "GB/s"])
    # block_until_ready does not reliably block on this rig (CLAUDE.md), so
    # force completion by fetching one element of a computation that depends
    # on the transferred array.
    from .timing import force

    ts = []
    for i in range(runs):
        host_i = host + np.uint32(i)  # fresh buffer: defeat transfer caching
        t0 = time.time()
        dev = jax.device_put(host_i)
        force(dev + np.uint32(1))
        ts.append((time.time() - t0) * 1e3)
    m = median(ts)
    t.add("host->device", mb, round(m, 1), round(mb / 1024 / (m / 1e3), 2))
    # Read back a *computed* array — a fresh one per run, since both the
    # runtime's retained host buffers and any client-side caching would
    # otherwise make the copy free.
    import jax.numpy as jnp

    ts = []
    for i in range(runs):
        computed = dev + jnp.uint32(i + 1)
        t0 = time.time()
        arr = np.asarray(computed)
        ts.append((time.time() - t0) * 1e3)
        assert arr[0] == i + 1
    m = median(ts)
    t.add("device->host", mb, round(m, 1), round(mb / 1024 / (m / 1e3), 2))
    return t


def add_points(batch: int = 1 << 18, runs: int = 3) -> Table:
    """Batched EC adds: Pallas masked-add kernel vs XLA curve ops
    (reference: add_points_benchmarks.ts:80 + wgsl add_points_benchmark)."""
    import jax
    import jax.numpy as jnp

    from ..ops import curve as C
    from ..ops.pallas import scan as PS
    from ..ops.pallas.ec import masked_add_rows

    rng = np.random.default_rng(0)
    # Valid limb-range rows are enough for throughput timing.
    a = jnp.asarray(rng.integers(0, 1 << 26, size=(batch, PS.TW), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 26, size=(batch, PS.TW), dtype=np.uint32))
    mask = jnp.ones((batch,), jnp.int32)
    fn = jax.jit(partial(masked_add_rows, interpret=None))
    comp, ts = time_device(fn, a, b, mask, runs=runs)
    t = Table(["impl", "adds", "compile (ms)", "median (ms)", "M adds/s"])
    m = median(ts)
    t.add("pallas masked_add_rows", batch, round(comp), round(m, 2),
          round(batch / m / 1e3, 2))

    # XLA curve-op path for comparison.
    x = jnp.asarray(rng.integers(0, 1 << 13, size=(batch, 20), dtype=np.uint32))
    pt = C.PointXYTZ(x, x, x, x)
    f2 = jax.jit(lambda p: C.add(p, p))
    comp, ts = time_device(f2, pt, runs=runs)
    m = median(ts)
    t.add("xla curve.add", batch, round(comp), round(m, 2),
          round(batch / m / 1e3, 2))
    return t


def scalar_mul(batch: int = 4096, runs: int = 3) -> Table:
    """Double-and-add vs Booth recoding (reference:
    scalar_mul_benchmarks.ts; Booth loses on random scalars,
    README.md:487-495)."""
    import jax
    import jax.numpy as jnp

    from ..cpu.curve import GENERATOR
    from ..ops import convert as CV
    from ..ops import curve as C
    from ..ops import field as F
    from ..ops import scalar_mul as SM

    rng = np.random.default_rng(0)
    coords = np.zeros((batch, 2, 8), dtype=np.uint32)
    gx, gy = GENERATOR.to_affine()
    for jw in range(8):
        coords[:, 0, jw] = (gx >> (32 * jw)) & 0xFFFFFFFF
        coords[:, 1, jw] = (gy >> (32 * jw)) & 0xFFFFFFFF
    k = rng.integers(0, 1 << 32, size=(batch, 8), dtype=np.uint64).astype(np.uint32)

    @jax.jit
    def prep(coords_u32):
        xm, ym, tm = CV.points_to_mont_limbs(coords_u32, PARAMS)
        z = jnp.broadcast_to(F.r_limbs(PARAMS), xm.shape)
        return C.PointXYTZ(xm, ym, tm, z)

    pts = prep(jnp.asarray(coords))
    t = Table(["strategy", "batch", "compile (ms)", "median (ms)", "k mults/s"])
    for name, fn in (("double_and_add", SM.double_and_add), ("booth", SM.booth)):
        f = jax.jit(partial(fn, num_bits=256, params=PARAMS))
        comp, ts = time_device(f, pts, jnp.asarray(k), runs=runs)
        m = median(ts)
        t.add(name, batch, round(comp), round(m, 2), round(batch / m, 1))
    return t


def bucket_reduction(num_windows: int = 16, runs: int = 3) -> Table:
    """The BPR stage in isolation (reference:
    bucket_points_reduction_benchmark.ts + horners_rule_benchmark.ts)."""
    import jax
    import jax.numpy as jnp

    from ..ops.msm_pipeline import identity_row_np
    from ..ops.pallas import bpr as PB

    nb = MsmConfig(chunk_size=16).num_buckets
    rng = np.random.default_rng(0)
    # Random-looking packed rows are fine for timing (not for correctness).
    rows = jnp.asarray(np.tile(identity_row_np(), (num_windows * nb, 1)))
    fn = jax.jit(partial(PB.bpr, num_windows=num_windows))
    comp, ts = time_device(fn, rows, runs=runs)
    t = Table(["buckets", "compile (ms)", "median (ms)"])
    t.add(num_windows * nb, round(comp), round(median(ts), 2))
    return t


def dashboard(power: int = 16, runs: int = 1) -> Table:
    """Race every MSM implementation at one input size, with correctness
    checks — the terminal analogue of the reference's benchmark UI
    (reference: src/ui/AllBenchmarks.tsx:156-222, Benchmark.tsx:29-51)."""
    from ..models.baselines import ALL_MSM_FUNCTIONS
    from ..utils import oracle
    from .full import _inputs_for_power

    coords, scalars, expected, src = _inputs_for_power(power)
    t = Table(["function", "first run incl. compile (ms)", "steady (ms)", "correct"])
    import jax as _jax

    for name, fn in ALL_MSM_FUNCTIONS.items():
        if "naive" in name and power > 14:
            t.add(name, "skipped (naive path is O(256 n) on-device)", "-", "-")
            continue
        if "precomputed" in name and _jax.default_backend() != "tpu":
            t.add(name, "skipped (Pallas path; interpret mode off-TPU)", "-", "-")
            continue
        t0 = time.time()
        res = fn(coords, scalars)
        first_ms = (time.time() - t0) * 1e3
        t0 = time.time()
        res = fn(coords, scalars)
        steady_ms = (time.time() - t0) * 1e3
        ok = "-"
        if expected is not None:
            ok = "✓" if (res["x"], res["y"]) == tuple(expected) else "✗"
        t.add(name, round(first_ms, 1), round(steady_ms, 1), ok)
        print(t.markdown().splitlines()[-1], flush=True)
    return t


def device_info_table() -> Table:
    """Device identity/limits (reference analogue:
    miscellaneous/print_device_limits.ts:1-29)."""
    from ..utils.runtime import device_info, device_memory_bytes

    info = device_info()
    t = Table(["property", "value"])
    for k in ("backend", "kind", "id", "num_devices", "process_index"):
        t.add(k, info[k])
    t.add("memory_bytes", device_memory_bytes())
    ms = info.get("memory_stats") or {}
    for k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use"):
        if k in ms:
            t.add(k, ms[k])
    return t


def stages(power: int = 20, runs: int = 3) -> Table:
    """Per-stage timing of the production pipeline at 2^power (c=16, one
    window group of 8): sort, gather, scan, BPR — the analogue of the
    reference's standalone transpose/SMVP stage experiments
    (reference: miscellaneous/cuzk/transpose_wgsl.ts:20-105,
    smvp_wgsl.ts:37-203) and the source of docs/DESIGN.md §5's budget."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops.pallas import bpr as PB
    from ..ops.pallas import scan as PS

    n = 1 << power
    wg = 8
    nb = 1 << 15
    rng = np.random.default_rng(0)
    t = Table(["stage", "shape", "compile (ms)", "median (ms)", "rate"])

    # Sort (the transpose analogue): [wg, n] keys + payload.
    keys = jnp.asarray(rng.integers(0, nb, size=(wg, n), dtype=np.int64).astype(np.int32))
    idxs = jnp.asarray(np.broadcast_to(np.arange(n, dtype=np.int32), (wg, n)).copy())
    sort_fn = jax.jit(lambda k, i: lax.sort((k, i), dimension=1, num_keys=1))
    comp, ts = time_device(sort_fn, keys, idxs, runs=runs)
    m = median(ts)
    t.add("sort", f"[{wg}, 2^{power}]", round(comp), round(m, 1),
          f"{wg * n / m / 1e3:.0f} M entries/s")

    # Row gather (sorted-order permutation): [n, TWR] table, wg*n rows.
    table = jnp.asarray(rng.integers(0, 1 << 13, size=(n, PS.TWR), dtype=np.int64).astype(np.uint32))
    gidx_np = rng.integers(0, n, size=(wg * n,), dtype=np.int64).astype(np.int32)
    gidx = jnp.asarray(gidx_np)
    gather_fn = jax.jit(lambda tb, ix: tb[ix])
    comp, ts = time_device(gather_fn, table, gidx, runs=runs)
    m = median(ts)
    t.add("gather", f"{wg}*2^{power} rows x {PS.TWR * 4} B", round(comp), round(m, 1),
          f"{wg * n / m / 1e3:.0f} M rows/s")

    # Gather directly into the scan's limb-major layout (the production
    # arrangement: the transpose is intended to fuse into the gather —
    # measured ~+0.6 ns/entry standalone, experiments/gather_layout_probe.py).
    nf = wg * n // PS.K
    lblk = PS.LBLK
    while nf % lblk:
        lblk //= 2

    # Production gather: per-row async-DMA kernel (ops/pallas/gather.py),
    # ~30% faster than the XLA gather on v5e (106 vs 77 M rows/s measured,
    # experiments/dma_gather_probe.py).
    if jax.default_backend() == "tpu":
        from ..ops.pallas import gather as GA

        # Built from the host-side copy: np.asarray(gidx) would fetch ~32 MB
        # back through the ~40 MB/s tunnel (ADVICE r4).
        pidx_t = jnp.asarray(gidx_np.reshape(nf, PS.K).T.copy())
        dma_fn = jax.jit(lambda tb, ix: GA.dma_row_gather(tb, ix, interpret=False))
        comp, ts = time_device(dma_fn, table, pidx_t, runs=runs)
        m = median(ts)
        t.add("gather (DMA, production)", f"{wg}*2^{power} rows x {PS.TWR * 4} B",
              round(comp), round(m, 1), f"{wg * n / m / 1e3:.0f} M rows/s")

    def gather_t(tb, ix):
        r = tb[ix].reshape(nf // lblk, lblk, PS.K, PS.TWR)[:, :, :, :64]
        return jnp.transpose(r, (0, 2, 3, 1))

    gather_t_fn = jax.jit(gather_t)
    comp, ts = time_device(gather_t_fn, table, gidx, runs=runs)
    m = median(ts)
    t.add("gather+transpose", f"{wg}*2^{power} rows -> limb-major", round(comp),
          round(m, 1), f"{wg * n / m / 1e3:.0f} M rows/s")

    # Segmented scan (the SMVP analogue) over the gathered rows.
    rows = gather_fn(table, gidx).reshape(nf, PS.K, PS.TWR)
    skeys = jnp.asarray(np.sort(rng.integers(0, nb, size=(PS.K, nf)).astype(np.int32), axis=0))
    scan_fn = jax.jit(lambda r, k: PS.msm_scan(r, k, interpret=False))
    comp, ts = time_device(scan_fn, rows, skeys, runs=runs)
    m = median(ts)
    t.add("scan (row-major)", f"{wg}*2^{power} entries", round(comp), round(m, 1),
          f"{wg * n / m / 1e3:.0f} M entries/s ({wg * n * 8 / m / 1e3:.0f} M mont/s)")

    # Production variant: row-major input + hoisted same-segment mask.
    scan_rm_fn = jax.jit(
        lambda r, k: PS.msm_scan_rm_sames(r, PS.keys_to_sames(k), interpret=False)
    )
    comp, ts = time_device(scan_rm_fn, rows, skeys, runs=runs)
    m = median(ts)
    t.add("scan (rm+sames, production)", f"{wg}*2^{power} entries", round(comp),
          round(m, 1),
          f"{wg * n / m / 1e3:.0f} M entries/s ({wg * n * 8 / m / 1e3:.0f} M mont/s)")

    rows_t = gather_t_fn(table, gidx)
    scan_p_fn = jax.jit(lambda r, k: PS.msm_scan_pret(r, k, interpret=False))
    comp, ts = time_device(scan_p_fn, rows_t, skeys, runs=runs)
    m = median(ts)
    t.add("scan (pret)", f"{wg}*2^{power} entries", round(comp),
          round(m, 1),
          f"{wg * n / m / 1e3:.0f} M entries/s ({wg * n * 8 / m / 1e3:.0f} M mont/s)")

    # BPR over one full window set (16 windows x 2^15 buckets).
    w = 16
    buckets = jnp.asarray(
        rng.integers(0, 1 << 13, size=(w * nb, PS.TW), dtype=np.int64).astype(np.uint32)
    )
    bpr_fn = jax.jit(lambda b: PB.bpr(b, w, interpret=False))
    comp, ts = time_device(bpr_fn, buckets, runs=runs)
    m = median(ts)
    t.add("bpr", f"{w} windows x 2^15 buckets", round(comp), round(m, 1),
          f"{w * nb / m / 1e3:.0f} M buckets/s")
    return t


def smtvp(n: int = 1 << 12, runs: int = 3) -> Table:
    """Device SMTVP experiment vs the production sorted-scan pipeline
    (reference analogue: miscellaneous/cuzk/smtvp_wgsl.ts:29-203 racing
    smtvp.template.wgsl against transpose+SMVP).  EC scatter serializes on
    TPU (group op, batch width 1), so this documents the measured rejection
    — see docs/DESIGN.md §6."""
    import jax
    import jax.numpy as jnp

    from ..ops import convert as CVo
    from ..ops import curve as C
    from ..ops import field as F
    from ..ops.smtvp import smtvp_buckets
    from ..utils.params import MsmConfig
    from ..utils import oracle

    cfg = MsmConfig(chunk_size=16 if n >= (1 << 16) else 13)
    rng = np.random.default_rng(0)
    if oracle.available():
        pts_u64 = oracle.gen_points(n, seed=1)
        coords = pts_u64.view(np.uint32).reshape(n, 2, 8)
    else:
        coords = rng.integers(0, 1 << 32, size=(n, 2, 8), dtype=np.uint64).astype(np.uint32)
        coords[:, :, 7] = 0
    sc = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    sc[:, 7] &= 0xFFFF

    dcoords = jnp.asarray(coords)
    dsc = jnp.asarray(sc)

    @jax.jit
    def one_window_smtvp(coords_u32, scalars_u32):
        xm, ym, tm = CVo.points_to_mont_limbs(coords_u32, PARAMS)
        z = jnp.broadcast_to(F.r_limbs(), xm.shape)
        pts = C.PointXYTZ(xm, ym, tm, z)
        digits = CVo.decompose_scalars_signed(scalars_u32, cfg)
        return smtvp_buckets(pts, digits[:, 0], cfg.num_buckets)

    t = Table(["method", "n", "windows", "compile (ms)", "median (ms)", "M (point,window)/s"])
    comp, ts = time_device(one_window_smtvp, dcoords, dsc, runs=runs)
    m = median(ts)
    t.add("smtvp scatter (1 window)", n, 1, round(comp), round(m, 1),
          round(n / m / 1e3, 3))

    from ..ops import msm_pipeline as MP

    if jax.default_backend() == "tpu":
        fn = jax.jit(partial(MP.msm_window_sums, cfg=cfg))
        comp, ts = time_device(fn, dcoords, dsc, runs=runs)
        m = median(ts)
        t.add("production sorted scan (all windows)", n, cfg.num_windows,
              round(comp), round(m, 1), round(n * cfg.num_windows / m / 1e3, 1))
    return t


def horners_rule(runs: int = 3) -> Table:
    """Horner aggregation of the 16 window sums: production Pallas fold
    (ops/pallas/bpr.py::horner_fold — the masked-SIMD power ladder that rides
    the BPR program's tail) vs device XLA curve ops vs host python bigints.
    The reference benchmarked a GPU Horner shader and rejected it
    (reference: horners_rule_benchmark.ts and README.md:269-275); standalone
    the device variants are dispatch-floor bound here too, but appended to an
    already-dispatched program the fold's marginal cost is ~0 — which is why
    production uses it (docs/DESIGN.md §4)."""
    import jax
    import jax.numpy as jnp

    from ..cpu.curve import GENERATOR
    from ..cpu.mirrors import horner as host_horner
    from ..ops import convert as CVx
    from ..ops import curve as C
    from ..ops import field as F

    w, c = 16, 16
    pts = []
    g = GENERATOR
    for i in range(w):
        pts.append(g)
        g = g.add(GENERATOR)
    coords = np.zeros((w, 2, 8), dtype=np.uint32)
    for i, p in enumerate(pts):
        x, y = p.to_affine()
        for jw in range(8):
            coords[i, 0, jw] = (x >> (32 * jw)) & 0xFFFFFFFF
            coords[i, 1, jw] = (y >> (32 * jw)) & 0xFFFFFFFF

    @jax.jit
    def device_horner(coords_u32):
        xm, ym, tm = CVx.points_to_mont_limbs(coords_u32, PARAMS)
        z = jnp.broadcast_to(F.r_limbs(PARAMS), xm.shape)
        p = C.PointXYTZ(xm, ym, tm, z)

        def body(i, acc):
            idx = w - 2 - i
            win = C.PointXYTZ(*(jnp.take(a, idx, axis=0)[None] for a in (p.x, p.y, p.t, p.z)))
            for _ in range(c):
                acc = C.double(acc, PARAMS)
            return C.add(acc, win, PARAMS)

        acc = C.PointXYTZ(*(a[w - 1:w] for a in (p.x, p.y, p.t, p.z)))
        return jax.lax.fori_loop(0, w - 1, body, acc)

    comp, ts = time_device(device_horner, jnp.asarray(coords), runs=runs)
    t = Table(["impl", "compile (ms)", "median (ms)"])
    t.add("device (XLA, 15x(16 dbl + add))", round(comp), round(median(ts), 2))

    from ..ops.pallas import bpr as PBk
    from ..ops.pallas.common import LP as LPk, W as WBITS

    rows = np.zeros((w, PBk.TW), np.uint32)
    for i, p in enumerate(pts):
        for ci, v in enumerate((p.x, p.y, p.t, p.z)):
            m = PARAMS.to_mont(v % PARAMS.p)
            limbs = [(m >> (WBITS * k)) & ((1 << WBITS) - 1) for k in range(20)]
            for k in range(LPk):
                rows[i, ci * LPk + k] = limbs[2 * k] | (limbs[2 * k + 1] << 16)

    fold = jax.jit(lambda r: PBk.horner_fold(r, c))
    compf, tsf = time_device(fold, jnp.asarray(rows), runs=runs)
    t.add("device (Pallas horner_fold, production)", round(compf),
          round(median(tsf), 2))

    hts = []
    for _ in range(runs):
        t0 = time.time()
        host_horner(pts, c)
        hts.append((time.time() - t0) * 1e3)
    t.add("host (python bigint)", 0, round(median(hts), 3))
    return t


def trace(power: int = 16, log_dir: str = "/tmp/msm_trace") -> Table:
    """Capture an XLA/TPU profiler trace of one MSM (view in
    TensorBoard/XProf) — the observability upgrade over the reference's
    wall-clock-only measurement (reference: ui/Benchmark.tsx:29-39)."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial

    from ..ops import msm_pipeline as MP
    from ..utils.params import tpu_msm_config
    from ..utils.profiling import device_trace
    from .full import _inputs_for_power

    coords, scalars, _, _ = _inputs_for_power(power)
    cfg = tpu_msm_config(coords.shape[0])
    dcoords = jax.device_put(jnp.asarray(coords))
    dscalars = jax.device_put(jnp.asarray(scalars))
    fn = jax.jit(_partial(MP.msm_window_sums, cfg=cfg))
    out = fn(dcoords, dscalars)
    _ = np.asarray(out)  # compile outside the trace
    with device_trace(log_dir):
        out = fn(dcoords, dscalars)
        _ = np.asarray(out)
    t = Table(["power", "trace dir"])
    t.add(power, log_dir)
    return t
