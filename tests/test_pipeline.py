"""End-to-end device pipeline tests: sorted bucket accumulation, BPR, and the
full cuZK MSM vs the python ground truth — the analogue of the reference's
per-stage debug validators (submission.ts:892-1363) and end-to-end fixture
check (ui/Benchmark.tsx:41-51)."""

import jax.numpy as jnp
import numpy as np
import pytest

from webgpu_msm_twisted_edwards_tpu.cpu.curve import naive_msm
from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import (
    bucket_accumulation_signed,
    decompose_scalars_signed as cpu_decompose,
    running_sum_bucket_reduction,
)
from webgpu_msm_twisted_edwards_tpu.models import cuzk
from webgpu_msm_twisted_edwards_tpu.ops import bpr as BPR
from webgpu_msm_twisted_edwards_tpu.ops import buckets as B
from webgpu_msm_twisted_edwards_tpu.ops import convert as CV
from webgpu_msm_twisted_edwards_tpu.utils import limbs as L
from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig

from conftest import random_points_scalars
from test_curve_ops import from_dev, to_dev


def _inputs(n, seed):
    pts, scalars = random_points_scalars(n, seed=seed)
    coords = np.stack(
        [L.ints_to_u32_words([p.x for p in pts]), L.ints_to_u32_words([p.y for p in pts])],
        axis=1,
    )
    sc = L.ints_to_u32_words(scalars)
    return pts, scalars, jnp.asarray(coords), jnp.asarray(sc)


def test_sort_buckets_layout():
    cfg = MsmConfig(chunk_size=4)
    pts, scalars, coords, sc = _inputs(32, seed=31)
    digits = CV.decompose_scalars_signed(sc, cfg)
    sb = B.sort_buckets(digits, cfg)
    nd = np.asarray(digits)
    nb = cfg.num_buckets
    for w in range(cfg.num_windows):
        keys = np.asarray(sb.keys[w])
        assert (np.diff(keys) >= 0).all()
        counts = np.asarray(sb.counts[w])
        starts = np.asarray(sb.starts[w])
        for b in range(nb):
            want = int(np.sum(np.abs(nd[:, w]) == b + 1))
            assert counts[b] == want
            seg = np.asarray(sb.point_idx[w])[starts[b] : starts[b] + counts[b]]
            assert set(seg.tolist()) == set(np.nonzero(np.abs(nd[:, w]) == b + 1)[0].tolist())


def test_bucket_accumulation_vs_cpu_mirror():
    cfg = MsmConfig(chunk_size=4)
    pts, scalars, coords, sc = _inputs(32, seed=32)
    digits_dev = CV.decompose_scalars_signed(sc, cfg)
    sb = B.sort_buckets(digits_dev, cfg)
    xm, ym, tm = CV.points_to_mont_limbs(coords)
    import webgpu_msm_twisted_edwards_tpu.ops.curve as C
    from webgpu_msm_twisted_edwards_tpu.ops import field as F

    z = jnp.broadcast_to(F.r_limbs(), xm.shape)
    table = C.PointXYTZ(xm, ym, tm, z)
    acc = B.accumulate_buckets(table, sb)

    digits_cpu = cpu_decompose(scalars, cfg.num_windows, cfg.chunk_size)
    want = bucket_accumulation_signed(pts, digits_cpu, cfg.num_windows, cfg.chunk_size)
    for w in range(cfg.num_windows):
        got_row = from_dev(acc[w])
        for b in range(cfg.num_buckets):
            g, e = got_row[b], want[w][b]
            if e.is_identity():
                assert g.is_identity()
            else:
                assert g.to_affine() == e.to_affine()


def test_bpr_vs_cpu_mirror():
    cfg = MsmConfig(chunk_size=4)
    pts, scalars, coords, sc = _inputs(48, seed=33)
    digits_cpu = cpu_decompose(scalars, cfg.num_windows, cfg.chunk_size)
    want_buckets = bucket_accumulation_signed(pts, digits_cpu, cfg.num_windows, cfg.chunk_size)
    dev_buckets_rows = [to_dev(row) for row in want_buckets]
    import webgpu_msm_twisted_edwards_tpu.ops.curve as C

    stacked = C.PointXYTZ(
        jnp.stack([r.x for r in dev_buckets_rows]),
        jnp.stack([r.y for r in dev_buckets_rows]),
        jnp.stack([r.t for r in dev_buckets_rows]),
        jnp.stack([r.z for r in dev_buckets_rows]),
    )
    got = from_dev(BPR.reduce_buckets(stacked, num_chunks=4))
    want = [running_sum_bucket_reduction(row) for row in want_buckets]
    for g, e in zip(got, want):
        if e.is_identity():
            assert g.is_identity()
        else:
            assert g.to_affine() == e.to_affine()


@pytest.mark.parametrize("n,chunk_size", [(64, 4), (256, 16)])
def test_compute_msm_end_to_end(n, chunk_size):
    pts, scalars, _, _ = _inputs(n, seed=34)
    expected = naive_msm(pts, scalars).to_affine()
    got = cuzk.compute_msm(
        [(p.x, p.y) for p in pts], scalars, chunk_size=chunk_size, bpr_chunks=4
    )
    assert (got["x"], got["y"]) == expected


def test_compute_msm_zero_scalars():
    pts, scalars, _, _ = _inputs(16, seed=35)
    got = cuzk.compute_msm([(p.x, p.y) for p in pts], [0] * 16, chunk_size=4, bpr_chunks=4)
    # 0 * anything = identity -> affine (0, 1).
    assert (got["x"], got["y"]) == (0, 1)


def test_compute_msm_accepts_bigintpoint_dicts():
    """API parity: the reference's BigIntPoint objects are {x, y, t, z} dicts
    (reference: src/reference/types.ts:1-6); compute_msm accepts them."""
    from conftest import random_points_scalars
    from webgpu_msm_twisted_edwards_tpu.models import cuzk

    pts, scalars = random_points_scalars(16, seed=30)
    tuples = [p.to_affine() for p in pts]
    dicts = [{"x": x, "y": y, "t": x * y, "z": 1} for x, y in tuples]
    a = cuzk.compute_msm(tuples, scalars, chunk_size=4, bpr_chunks=4)
    b = cuzk.compute_msm(dicts, scalars, chunk_size=4, bpr_chunks=4)
    assert a == b


def test_naive_msm_baseline():
    """tpu_naive_msm (per-point double-and-add + tree sum) matches the
    python sum — the reference's naive-baseline check
    (reference: naiveMSMEntry.ts:38-260)."""
    from conftest import random_points_scalars
    from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
    from webgpu_msm_twisted_edwards_tpu.models.baselines import tpu_naive_msm

    pts, scalars = random_points_scalars(8, seed=31)
    res = tpu_naive_msm([p.to_affine() for p in pts], scalars)
    want = ExtPoint(0, 1, 0, 1)
    for p, s in zip(pts, scalars):
        want = want.add(p.mul(s))
    assert (res["x"], res["y"]) == want.to_affine()


def test_scalar_domain_guard_reduces_oversized_scalars():
    """Scalars >= the subgroup order (up to full 256-bit) are reduced mod the
    order instead of silently wrong-answering via the dropped decomposition
    carry (reference throws instead: miscellaneous/utils.ts:81-84)."""
    from webgpu_msm_twisted_edwards_tpu.utils.params import SUBGROUP_ORDER

    pts, _, _, _ = _inputs(4, seed=36)
    big = [
        (1 << 256) - 1,                   # max 256-bit value
        (1 << 255) + 12345,               # would produce a final signed carry
        SUBGROUP_ORDER,                   # boundary: == order -> 0
        SUBGROUP_ORDER - 1,               # boundary: in-domain, untouched
    ]
    expected = naive_msm(pts, [b % SUBGROUP_ORDER for b in big]).to_affine()
    got = cuzk.compute_msm([(p.x, p.y) for p in pts], big, chunk_size=4, bpr_chunks=4)
    assert (got["x"], got["y"]) == expected


def test_reduce_scalars_mod_order_words():
    from webgpu_msm_twisted_edwards_tpu.utils.params import SUBGROUP_ORDER

    vals = [0, 1, SUBGROUP_ORDER - 1, SUBGROUP_ORDER, SUBGROUP_ORDER + 7, (1 << 256) - 1]
    sc = L.ints_to_u32_words(vals)
    out = cuzk.reduce_scalars_mod_order(sc)
    got = [L.words_le_to_int(row, 32) for row in out.astype(np.uint64)]
    assert got == [v % SUBGROUP_ORDER for v in vals]
    # In-domain input is returned unchanged (no copy even).
    sc_ok = L.ints_to_u32_words([1, 2, 3])
    assert cuzk.reduce_scalars_mod_order(sc_ok) is sc_ok


def test_smtvp_experiment_matches_naive():
    """Device SMTVP scatter experiment (ops/smtvp.py — the reference's
    smtvp.template.wgsl analogue, kept as a measured-rejection benchmark)
    produces the same MSM as the naive sum."""
    from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import horner
    from webgpu_msm_twisted_edwards_tpu.ops.smtvp import smtvp_window_sums

    pts, scalars, coords, sc = _inputs(24, seed=41)
    cfg = MsmConfig(chunk_size=4)
    sums = smtvp_window_sums(coords, sc, cfg)
    import jax

    sums = jax.tree_util.tree_map(np.asarray, sums)
    total = horner(cuzk.window_sums_to_extpoints(sums), cfg.chunk_size)
    assert total.to_affine() == naive_msm(pts, scalars).to_affine()


def test_default_window_group_derivation():
    """The window-group cap derives from reported device memory and
    reproduces the hand-tuned table on a 16 GB chip (VERDICT #9)."""
    from unittest import mock

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    with mock.patch(
        "webgpu_msm_twisted_edwards_tpu.utils.runtime.device_memory_bytes",
        return_value=16 * (1 << 30),
    ):
        assert MP.default_window_group(1 << 20, 16) == 8
        assert MP.default_window_group(1 << 21, 16) == 4
        # wg=2 at 2^22 measured 1.4% slower than wg=1 (13.1 GB peak, allocator
        # pressure near the budget edge) — the staging estimate now caps it at 1.
        assert MP.default_window_group(1 << 22, 16) == 1
        assert MP.default_window_group(1 << 16, 20) == 20
    # A smaller chip gets a smaller cap, never zero.
    with mock.patch(
        "webgpu_msm_twisted_edwards_tpu.utils.runtime.device_memory_bytes",
        return_value=4 * (1 << 30),
    ):
        assert MP.default_window_group(1 << 20, 16) in (1, 2)
        assert MP.default_window_group(1 << 22, 16) == 1


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="compiles the staged interpret pipeline (~4 min CPU); RUN_SLOW=1",
)
def test_staged_matches_monolithic_interpret():
    """msm_window_sums_staged (separately compiled stage programs) must be
    bit-identical to the monolithic msm_window_sums."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    pts, scalars, coords, sc = _inputs(64, seed=55)
    cfg = MsmConfig(chunk_size=8)
    mono = jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))
    a = np.asarray(mono(coords, sc))
    b = np.asarray(MP.msm_window_sums_staged(coords, sc, cfg, interpret=True, _force_staged=True))
    assert (a == b).all()


def test_single_table_matches_doubled_interpret(monkeypatch):
    """MSM_SINGLE_TABLE layout (n-row table, sign applied in-kernel via bit 1
    of the hoisted mask word) must compute the same window sums as the
    doubled pre-negated table.  Limb representatives may differ (the in-kernel
    4p - v negation vs the convert kernel's pre-negated row), so compare
    coordinate VALUES mod p after un-Montgomery."""
    from functools import partial

    import jax

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    pts, scalars, coords, sc = _inputs(64, seed=77)
    cfg = MsmConfig(chunk_size=8)
    fn = jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))
    a = np.asarray(fn(coords, sc))
    monkeypatch.setattr(MP, "_SINGLE_TABLE", True)
    fn2 = jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))
    b = np.asarray(fn2(coords, sc))
    pa = cuzk.packed_rows_to_extpoints(a)
    pb = cuzk.packed_rows_to_extpoints(b)
    assert pa == pb
    # And both match the CPU ground truth window sums.
    digits = cpu_decompose(scalars, cfg.num_windows, cfg.chunk_size)
    want_buckets = bucket_accumulation_signed(pts, digits, cfg.num_windows, cfg.chunk_size)
    for w in range(cfg.num_windows):
        want = running_sum_bucket_reduction(want_buckets[w])
        if want.is_identity():
            assert pa[w].is_identity(), w
        else:
            assert pa[w].to_affine() == want.to_affine(), w


def test_rm_layout_matches_pret_interpret(monkeypatch):
    """MSM_SCAN_LAYOUT=rm (row-major gather output straight into the kernel)
    must be bit-identical to the default pret layout end-to-end."""
    from functools import partial

    import jax

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    pts, scalars, coords, sc = _inputs(64, seed=78)
    cfg = MsmConfig(chunk_size=8)
    a = np.asarray(jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))(coords, sc))
    monkeypatch.setattr(MP, "_SCAN_LAYOUT", "rm")
    b = np.asarray(jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))(coords, sc))
    assert (a == b).all()


def test_quarter_store_scan_matches_full_interpret(monkeypatch):
    """MSM_SCAN_QSTORE (scan stores only steps 4i+2/4i+3; extraction replays
    <= 2 scan steps inside the fused kernel — VERDICT r4 #2) must be
    BIT-identical to the full-store pipeline: the reconstruction runs the
    same select+madd recurrence on the same packed representatives."""
    from functools import partial

    import jax

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    # n=128 with c=8 gives multi-fragment windows (2 fragments of K=64), so
    # carries, fragment-start restarts, and both r<2 / r>=2 end classes all
    # occur; seed 79 checked to produce ends in every residue class mod 4.
    pts, scalars, coords, sc = _inputs(128, seed=79)
    cfg = MsmConfig(chunk_size=8)
    a = np.asarray(jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))(coords, sc))
    monkeypatch.setattr(MP, "_SCAN_QSTORE", True)
    b = np.asarray(jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))(coords, sc))
    assert (a == b).all()


def test_i64_sort_matches_variadic_interpret(monkeypatch):
    """MSM_SORT_I64 (one-operand (key<<32)|idx sort) must produce the same
    window sums AS GROUP ELEMENTS: within-bucket entry order may differ from
    the stable variadic sort (ties break by idx value), so packed projective
    representatives can differ while the points must not."""
    from functools import partial

    import jax

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    pts, scalars, coords, sc = _inputs(128, seed=80)
    cfg = MsmConfig(chunk_size=8)
    a = np.asarray(jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))(coords, sc))
    monkeypatch.setattr(MP, "_SORT_I64", True)
    b = np.asarray(jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))(coords, sc))
    pa = cuzk.packed_rows_to_extpoints(a)
    pb = cuzk.packed_rows_to_extpoints(b)
    for x, y in zip(pa, pb):
        if x.is_identity() or y.is_identity():
            assert x.is_identity() and y.is_identity()
        else:
            assert x.to_affine() == y.to_affine()


def test_compute_msm_device_resident_inputs():
    """compute_msm accepts DEVICE-RESIDENT jax arrays first-class (the
    production pattern: SRS + witness already in HBM), including the
    scalar-domain guard running as one device-side compare — an oversized
    scalar must still be reduced mod the subgroup order."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils.params import SUBGROUP_ORDER

    pts, scalars, coords, sc = _inputs(16, seed=91)
    want = cuzk.compute_msm([p.to_affine() for p in pts], scalars,
                            chunk_size=4, bpr_chunks=4)
    got = cuzk.compute_msm(jnp.asarray(np.asarray(coords)),
                           jnp.asarray(np.asarray(sc)),
                           chunk_size=4, bpr_chunks=4)
    assert got == want
    # Oversized scalar in raw words through the device guard path.
    big = [SUBGROUP_ORDER + 5] + scalars[1:]
    raw = L.ints_to_u32_words(big)
    got2 = cuzk.compute_msm(jnp.asarray(np.asarray(coords)), jnp.asarray(raw),
                            chunk_size=4, bpr_chunks=4)
    want2 = cuzk.compute_msm([p.to_affine() for p in pts],
                             [b % SUBGROUP_ORDER for b in big],
                             chunk_size=4, bpr_chunks=4)
    assert got2 == want2


def test_compute_msm_batch_matches_single():
    """compute_msm_batch (one point set, many scalar vectors — table reused)
    must agree element-wise with one-shot compute_msm."""
    from webgpu_msm_twisted_edwards_tpu.models.cuzk import compute_msm_batch

    pts, s0, _, _ = _inputs(32, seed=61)
    _, s1, _, _ = _inputs(32, seed=62)
    aff = [(p.x, p.y) for p in pts]
    batch = compute_msm_batch(aff, [s0, s1], chunk_size=4)
    for sc, got in zip((s0, s1), batch):
        want = cuzk.compute_msm(aff, sc, chunk_size=4, bpr_chunks=4)
        assert got == want


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="compiles the staged interpret pipeline (~4 min CPU); RUN_SLOW=1",
)
def test_compute_msm_batch_pallas_interpret():
    from webgpu_msm_twisted_edwards_tpu.models.cuzk import compute_msm_batch

    pts, s0, _, _ = _inputs(64, seed=63)
    _, s1, _, _ = _inputs(64, seed=64)
    aff = [(p.x, p.y) for p in pts]
    batch = compute_msm_batch(aff, [s0, s1], chunk_size=8, interpret=True)
    for sc, got in zip((s0, s1), batch):
        want = naive_msm(pts, sc).to_affine()
        assert (got["x"], got["y"]) == want


def test_horner_fold_matches_host_horner():
    """Device Horner fold (ops/pallas/bpr.py::horner_fold) must agree with the
    host mirror for W window sums at several (W, c), including non-power-of-2
    lane padding."""
    from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import horner
    from webgpu_msm_twisted_edwards_tpu.ops.pallas import bpr as PB
    from webgpu_msm_twisted_edwards_tpu.ops.pallas.common import LP, W as WBITS
    from webgpu_msm_twisted_edwards_tpu.utils.params import PARAMS
    import jax.numpy as jnp

    def pack_point(p):
        row = np.zeros(PB.TW, np.uint32)
        for ci, v in enumerate((p.x, p.y, p.t, p.z)):
            m = PARAMS.to_mont(v % PARAMS.p)
            limbs = [(m >> (WBITS * i)) & ((1 << WBITS) - 1) for i in range(20)]
            for i in range(LP):
                row[ci * LP + i] = limbs[2 * i] | (limbs[2 * i + 1] << 16)
        return row

    for w, c, seed in [(16, 16, 71), (20, 13, 72)]:
        pts, _, _, _ = _inputs(w, seed=seed)
        rows = jnp.asarray(np.stack([pack_point(p) for p in pts]))
        out = np.asarray(PB.horner_fold(rows, c, interpret=True))
        got = cuzk.packed_rows_to_extpoints(out)[0].to_affine()
        want = horner(pts, c).to_affine()
        assert got == want, (w, c)


def test_blocked_matches_staged_interpret():
    """msm_window_sums_blocked (streaming point blocks + EC combine — the
    large-n path for tables beyond device memory) must be bit-identical to
    the unblocked pipeline on the concatenated input."""
    import jax
    from functools import partial

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    pts, scalars, coords, sc = _inputs(128, seed=81)
    cfg = MsmConfig(chunk_size=8)
    mono = jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))
    a = np.asarray(mono(coords, sc))
    b = np.asarray(MP.msm_window_sums_blocked(coords, sc, cfg, block=64,
                                              interpret=True))
    # Blocked combine goes through EC adds, so compare as points (the packed
    # Montgomery representatives differ; the group elements must not).
    pa = cuzk.packed_rows_to_extpoints(a)
    pb = cuzk.packed_rows_to_extpoints(b)
    assert all(x.to_affine() == y.to_affine() for x, y in zip(pa, pb))


def test_batch_blocked_matches_unblocked_interpret():
    """The streaming batch path (each block's table converted ONCE for all k
    MSMs, per-MSM EC accumulation across blocks — VERDICT r4 #4) must match
    the unblocked batch bit-for-bit as group elements."""
    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    _, s0, coords, sc0 = _inputs(128, seed=83)
    _, s1, _, sc1 = _inputs(128, seed=84)
    cfg = MsmConfig(chunk_size=8)
    want = MP.msm_window_sums_batch(coords, [sc0, sc1], cfg, interpret=True)
    got = MP.msm_window_sums_batch(coords, [sc0, sc1], cfg, interpret=True,
                                   block=64)
    for a, b in zip(want, got):
        pa = cuzk.packed_rows_to_extpoints(np.asarray(a))
        pb = cuzk.packed_rows_to_extpoints(np.asarray(b))
        assert all(x.to_affine() == y.to_affine() for x, y in zip(pa, pb))


def test_default_block_size_derivation():
    """Block sizing for the streaming large-n path: the doubled table of one
    block stays under ~40% of device memory; blocks shrink to divide n."""
    from unittest import mock

    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP

    with mock.patch(
        "webgpu_msm_twisted_edwards_tpu.utils.runtime.device_memory_bytes",
        return_value=16 * (1 << 30),
    ):
        b = MP.default_block_size(1 << 24)
        assert b == (1 << 22)                       # 2n*512B = 4.3 GB < 40%
        assert MP.default_block_size(1 << 20) == 1 << 20   # fits: no blocking
    with mock.patch(
        "webgpu_msm_twisted_edwards_tpu.utils.runtime.device_memory_bytes",
        return_value=4 * (1 << 30),
    ):
        assert MP.default_block_size(1 << 24) == (1 << 20)
