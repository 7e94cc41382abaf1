"""Pure-python ground-truth layer tests (the FieldMath analogue;
reference: src/reference/utils/FieldMath.test.ts)."""

import random

from webgpu_msm_twisted_edwards_tpu.cpu import field as F
from webgpu_msm_twisted_edwards_tpu.cpu.curve import (
    GENERATOR,
    ExtPoint,
    get_point_from_x,
    naive_msm,
)
from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import (
    bucket_accumulation_signed,
    cuzk_serial_msm,
    decompose_scalars_signed,
    horner,
    parallel_bucket_reduction,
    pippenger_msm,
    running_sum_bucket_reduction,
)
from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig, P, SUBGROUP_ORDER

from conftest import random_points_scalars


def test_field_basics():
    r = random.Random(1)
    for _ in range(20):
        a, b = r.randrange(P), r.randrange(P)
        assert F.fadd(a, b) == (a + b) % P
        assert F.fsub(a, b) == (a - b) % P
        assert F.fmul(a, b) == a * b % P
        assert F.fmul(a, F.finv(a)) == 1
    s = F.fsqrt(4)
    assert s is not None and F.fmul(s, s) == 4


def test_generator_on_curve_and_order():
    GENERATOR.assert_on_curve()
    assert GENERATOR.mul(SUBGROUP_ORDER).is_identity()
    assert not GENERATOR.mul(2).is_identity()


def test_add_double_consistency():
    g2a = GENERATOR.add(GENERATOR)
    g2b = GENERATOR.double()
    assert g2a.to_affine() == g2b.to_affine()
    # Unified add handles identity.
    assert GENERATOR.add(ExtPoint.identity()).to_affine() == GENERATOR.to_affine()
    # P + (-P) = identity
    assert GENERATOR.add(GENERATOR.neg()).is_identity()


def test_scalar_mul_matches_repeated_add():
    acc = ExtPoint.identity()
    for k in range(8):
        assert GENERATOR.mul(k).to_affine() == acc.to_affine()
        acc = acc.add(GENERATOR)


def test_get_point_from_x():
    x, y = GENERATOR.to_affine()
    pt = get_point_from_x(x)
    assert pt.to_affine()[0] == x


def test_signed_decomposition_roundtrip():
    """1024 random scalars reconstruct exactly — the analogue of
    reference miscellaneous/tests/signed_buckets.test.ts:43-69."""
    r = random.Random(7)
    for c in (16, 4):
        num_windows = -(-256 // c)
        scalars = [r.randrange(SUBGROUP_ORDER) for _ in range(256)]
        digits = decompose_scalars_signed(scalars, num_windows, c)
        for s, ds in zip(scalars, digits):
            v = sum(d << (c * i) for i, d in enumerate(ds))
            assert v == s
            assert all(-(1 << (c - 1)) <= d < (1 << (c - 1)) for d in ds)


def test_cuzk_serial_pipeline_small():
    """End-to-end algorithm test, 16 points with chunk_size 4, all bucket
    reduction variants — mirror of reference
    miscellaneous/tests/cuzk.test.ts:27-141."""
    points, scalars = random_points_scalars(16, seed=5)
    expected = naive_msm(points, scalars).to_affine()
    cfg = MsmConfig(chunk_size=4)

    got = cuzk_serial_msm(points, scalars, cfg).to_affine()
    assert got == expected

    # parallel (2-stage) bucket reduction agrees with the serial running sum.
    digits = decompose_scalars_signed(scalars, cfg.num_windows, cfg.chunk_size)
    buckets = bucket_accumulation_signed(points, digits, cfg.num_windows, cfg.chunk_size)
    sums_serial = [running_sum_bucket_reduction(b) for b in buckets]
    sums_par = [parallel_bucket_reduction(b, num_threads=4) for b in buckets]
    for a, b in zip(sums_serial, sums_par):
        assert a.to_affine() == b.to_affine()
    assert horner(sums_par, cfg.chunk_size).to_affine() == expected


def test_pippenger_matches_naive():
    points, scalars = random_points_scalars(16, seed=6)
    assert pippenger_msm(points, scalars, 16).to_affine() == naive_msm(points, scalars).to_affine()
