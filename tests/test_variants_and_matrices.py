"""Tests for the parity modules: Montgomery limb-width variants, Barrett,
Barrett-Domb, matrix classes + serial cuZK, baselines registry, and the
fixture loader round-trip (reference test strategy analogues:
miscellaneous/tests/{utils,barrett_domb,matrices,cuzk}.test.ts)."""

import random

import numpy as np
import pytest

from conftest import random_points_scalars
from webgpu_msm_twisted_edwards_tpu.cpu import barrett_domb as BD
from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
from webgpu_msm_twisted_edwards_tpu.cpu.matrices import (
    CSRSparseMatrix,
    DenseMatrix,
    ELLSparseMatrix,
    execute_serial_cuzk,
)
from webgpu_msm_twisted_edwards_tpu.utils.params import (
    PARAMS,
    MsmConfig,
)


def test_mont_mul_variants_all_widths():
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.montgomery_variants import mont_mul_for_width

    rng = np.random.default_rng(0)
    for w in (12, 13, 14, 15, 16):
        params, fn = mont_mul_for_width(w)
        L = params.num_words
        B = 16
        xv = [int(rng.integers(0, 2**60)) * int(rng.integers(0, 2**60)) % params.p for _ in range(B)]
        yv = [int(rng.integers(0, 2**60)) * int(rng.integers(0, 2**60)) % params.p for _ in range(B)]

        def to_limbs(vals):
            a = np.zeros((B, L), np.uint32)
            for i, v in enumerate(vals):
                for j in range(L):
                    a[i, j] = (v >> (j * w)) & params.mask
            return jnp.asarray(a)

        out = np.asarray(fn(to_limbs(xv), to_limbs(yv)))
        rinv = pow(1 << (L * w), -1, params.p)
        for i in range(B):
            got = sum(int(out[i, j]) << (j * w) for j in range(L))
            assert got == xv[i] * yv[i] * rinv % params.p, (w, i)


def test_barrett_mul():
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.barrett import barrett_mul

    rng = np.random.default_rng(1)
    B, L, w = 16, PARAMS.num_words, PARAMS.word_size
    xv = [int(rng.integers(0, 2**60)) * int(rng.integers(0, 2**60)) % PARAMS.p for _ in range(B)]
    yv = [int(rng.integers(0, 2**60)) * int(rng.integers(0, 2**60)) % PARAMS.p for _ in range(B)]

    def to_limbs(vals):
        a = np.zeros((B, L), np.uint32)
        for i, v in enumerate(vals):
            for j in range(L):
                a[i, j] = (v >> (j * w)) & PARAMS.mask
        return jnp.asarray(a)

    out = np.asarray(barrett_mul(to_limbs(xv), to_limbs(yv)))
    for i in range(B):
        got = sum(int(out[i, j]) << (j * w) for j in range(L))
        assert got == xv[i] * yv[i] % PARAMS.p, i


def test_barrett_domb_mirror():
    rng = random.Random(2)
    for _ in range(50):
        x = rng.randrange(0, PARAMS.p)
        y = rng.randrange(0, PARAMS.p)
        assert BD.barrett_domb_mul_int(x, y) == x * y % PARAMS.p
    # Building blocks.
    lo, hi = BD.machine_multiply(8191, 8191, 13)
    assert lo | (hi << 13) == 8191 * 8191
    a = BD.to_limbs(12345678901234567890, 20, 13)
    assert BD.from_limbs(a, 13) == 12345678901234567890
    s, _ = BD.mp_adder(a, a, 13)
    assert BD.from_limbs(s, 13) == 2 * 12345678901234567890
    d, borrow = BD.mp_subtracter(a, a, 13)
    assert BD.from_limbs(d, 13) == 0 and borrow == 0
    assert BD.from_limbs(BD.mp_full_multiply(a, a, 13), 13) == 12345678901234567890**2


def test_barrett_domb_msb_lsb_building_blocks():
    """mp_msb_multiply / mp_lsb_multiply semantics vs exact bigint halves —
    the reference's hard-coded-vector style (reference:
    miscellaneous/tests/barrett_domb.test.ts)."""
    w, L = PARAMS.word_size, PARAMS.num_words
    rng = random.Random(7)
    # Hard-coded vectors first (stable regression anchors).
    fixed = [
        (2**253 - 1, 2**253 - 5),
        (0x1234567890ABCDEF1234567890ABCDEF, 0xFEDCBA0987654321),
        (1, PARAMS.p - 1),
    ]
    cases = fixed + [(rng.randrange(1 << L * w), rng.randrange(1 << L * w)) for _ in range(20)]
    for x, y in cases:
        a, b = BD.to_limbs(x, L, w), BD.to_limbs(y, L, w)
        # LSB half is exact: (x*y) mod 2^(L*w).
        assert BD.from_limbs(BD.mp_lsb_multiply(a, b, w)[:L], w) == (x * y) % (1 << L * w)
        # MSB half is a floor estimate of (x*y) >> L*w missing only the
        # carries out of the dropped columns < L-1: error in [0, L].
        exact_hi = (x * y) >> (L * w)
        got_hi = BD.from_limbs(BD.mp_msb_multiply(a, b, w), w)
        assert 0 <= exact_hi - got_hi <= L, (exact_hi, got_hi)


def test_barrett_domb_device():
    """Device (XLA) Barrett-Domb vs exact products, incl. boundary values
    (reference device analogue: wgsl/barrett_domb.template.wgsl:1-188)."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.barrett_domb import barrett_domb_mul

    rng = random.Random(11)
    p = PARAMS.p
    w, L = PARAMS.word_size, PARAMS.num_words
    vals = [(p - 1, p - 1), (0, 123), (1, p - 1), (p - 2, 2)] + [
        (rng.randrange(p), rng.randrange(p)) for _ in range(28)
    ]
    xs = jnp.asarray(np.stack([BD.to_limbs(x, L, w) for x, _ in vals]).astype(np.uint32))
    ys = jnp.asarray(np.stack([BD.to_limbs(y, L, w) for _, y in vals]).astype(np.uint32))
    out = np.asarray(barrett_domb_mul(xs, ys))
    for i, (x, y) in enumerate(vals):
        assert BD.from_limbs(out[i].tolist(), w) == x * y % p, i
        # And the CPU mirror agrees limb-for-limb.
        assert out[i].tolist() == BD.barrett_domb_mul(
            BD.to_limbs(x, L, w), BD.to_limbs(y, L, w)
        ), i


def test_matrices_roundtrip():
    # Mock group op: string concatenation, like the reference's CSR tests
    # (reference: miscellaneous/tests/create_csr.test.ts:12-93).
    dense = DenseMatrix([
        ["a", None, "b"],
        [None, "c", None],
        ["d", "e", None],
    ])
    ell = ELLSparseMatrix.dense_to_sparse_matrix(dense)
    assert ell.row_length == [2, 1, 2]
    csr = CSRSparseMatrix.ell_to_csr(ell, 3)
    assert csr.data == ["a", "b", "c", "d", "e"]
    assert csr.row_ptr == [0, 2, 3, 5]
    t = csr.transpose()
    # Column 0 held a (row 0), d (row 2); column 1: c, e; column 2: b.
    assert t.data == ["a", "d", "c", "e", "b"]
    assert t.col_idx == [0, 2, 1, 2, 0]
    tt = t.transpose()
    assert tt.data == csr.data and tt.col_idx == csr.col_idx and tt.row_ptr == csr.row_ptr

    add = lambda a, b: a + b
    scale = lambda elem, v: elem * v
    assert csr.smvp([1, 1, 1], add, scale) == ["ab", "c", "de"]
    assert csr.smtvp([1, 1, 1], add, scale) == ["ad", "ce", "b"]
    assert dense.transpose().data[0] == ["a", None, "d"]


def test_serial_cuzk_matches_naive():
    n = 24
    pts, scalars = random_points_scalars(n, seed=9)
    cfg = MsmConfig(chunk_size=4)
    got = execute_serial_cuzk(pts, scalars, cfg)
    want = ExtPoint(0, 1, 0, 1)
    for p, s in zip(pts, scalars):
        want = want.add(p.mul(s))
    assert got.to_affine() == want.to_affine()


def test_fixture_roundtrip(tmp_path):
    from webgpu_msm_twisted_edwards_tpu.utils import test_data as TD

    pts, scalars = random_points_scalars(8, seed=3)
    points = [p.to_affine() for p in pts]
    TD.save_test_case(points, scalars, power=3, base_dir=str(tmp_path))
    assert TD.available(3, str(tmp_path))
    tc = TD.load_test_case(3, str(tmp_path))
    assert tc.points == points
    assert tc.scalars == list(scalars)
    assert TD.EXPECTED_RESULTS[16][0] > 0


def test_cpu_baselines_agree():
    from webgpu_msm_twisted_edwards_tpu.models import baselines as B
    from webgpu_msm_twisted_edwards_tpu.utils import oracle

    if not oracle.available():
        pytest.skip("liboracle.so not built")
    pts, scalars = random_points_scalars(32, seed=4)
    points = [p.to_affine() for p in pts]
    serial = B.cpu_compute_msm(points, scalars)
    parallel = B.cpu_compute_msm_parallel(points, scalars)
    assert serial == parallel
    want = ExtPoint(0, 1, 0, 1)
    for p, s in zip(pts, scalars):
        want = want.add(p.mul(s))
    assert (serial["x"], serial["y"]) == want.to_affine()


def test_preaggregation_string_mock():
    # String concatenation as the group op, like the reference's CSR test
    # (reference: miscellaneous/tests/create_csr.test.ts:12-93).
    from webgpu_msm_twisted_edwards_tpu.cpu.preaggregation import (
        create_csr_cpu,
        pre_aggregate,
        precompute_with_cluster_method,
    )

    points = ["P0", "P1", "P2", "P3", "P4"]
    chunks = [3, 1, 3, 0, 1]
    clusters = precompute_with_cluster_method(chunks, len(points))
    assert clusters == {3: [0, 2], 1: [1, 4]}
    vals, cvals = pre_aggregate(points, clusters, add=lambda a, b: a + b)
    assert sorted(zip(cvals, vals)) == [(1, "P1P4"), (3, "P0P2")]
    csr = create_csr_cpu(points, chunks, num_buckets=4, add=lambda a, b: a + b)
    assert csr.data == ["P1P4", "P0P2"]
    assert csr.col_idx == [0, 2]
    assert csr.row_ptr == [0, 2]


def test_scalar_mul_booth_vs_double_and_add():
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
    from webgpu_msm_twisted_edwards_tpu.models import cuzk
    from webgpu_msm_twisted_edwards_tpu.ops import convert as CV
    from webgpu_msm_twisted_edwards_tpu.ops import curve as C
    from webgpu_msm_twisted_edwards_tpu.ops import field as F
    from webgpu_msm_twisted_edwards_tpu.ops import scalar_mul as SM
    from webgpu_msm_twisted_edwards_tpu.utils.params import PARAMS
    import jax
    import numpy as np

    pts, scalars = random_points_scalars(4, seed=12)
    coords, sc = cuzk.prepare_inputs([p.to_affine() for p in pts], scalars)

    @jax.jit
    def prep(coords_u32):
        xm, ym, tm = CV.points_to_mont_limbs(coords_u32, PARAMS)
        z = jnp.broadcast_to(F.r_limbs(PARAMS), xm.shape)
        return C.PointXYTZ(xm, ym, tm, z)

    dev_pts = prep(jnp.asarray(coords))
    for fn in (SM.double_and_add, SM.booth):
        out = fn(dev_pts, jnp.asarray(sc))
        got = cuzk.window_sums_to_extpoints(
            jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        )
        for g, p, s in zip(got, pts, scalars):
            assert g.to_affine() == p.mul(s).to_affine()
