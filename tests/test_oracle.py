"""Native C++ oracle vs the pure-python ground truth — the analogue of the
reference's WASM function tests (reference: src/reference/utils/
wasmFunctions.test.ts, which verify field/group ops against Aleo WASM)."""

import random

import pytest

from webgpu_msm_twisted_edwards_tpu.cpu.curve import naive_msm
from webgpu_msm_twisted_edwards_tpu.utils import oracle
from webgpu_msm_twisted_edwards_tpu.utils.params import P, SUBGROUP_ORDER

from conftest import random_points_scalars

pytestmark = pytest.mark.skipif(not oracle.available(), reason="liboracle.so not built (make -C cpp)")


def test_fp_mul():
    r = random.Random(61)
    for _ in range(50):
        a, b = r.randrange(P), r.randrange(P)
        assert oracle.fp_mul(a, b) == a * b % P
    assert oracle.fp_mul(0, 123) == 0
    assert oracle.fp_mul(P - 1, P - 1) == (P - 1) * (P - 1) % P


def test_point_add():
    pts, _ = random_points_scalars(4, seed=62)
    a, b = pts[0], pts[1]
    want = a.add(b).to_affine()
    got = oracle.point_add(a.to_affine(), b.to_affine())
    assert got == want
    # doubling through the unified add
    assert oracle.point_add(a.to_affine(), a.to_affine()) == a.double().to_affine()


@pytest.mark.parametrize("c", [4, 16])
def test_oracle_msm_matches_naive(c):
    pts, scalars = random_points_scalars(64, seed=63)
    want = naive_msm(pts, scalars).to_affine()
    got = oracle.msm([p.to_affine() for p in pts], scalars, c=c)
    assert got == want


def test_oracle_msm_larger():
    pts, scalars = random_points_scalars(512, seed=64)
    want = naive_msm(pts, scalars).to_affine()
    assert oracle.msm([p.to_affine() for p in pts], scalars, c=16) == want


def test_gen_points_on_curve_and_deterministic():
    """Fixture generation integrity: points are on the curve, in the
    prime-order subgroup, and deterministic per seed."""
    import pytest

    from webgpu_msm_twisted_edwards_tpu.utils import oracle
    from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
    from webgpu_msm_twisted_edwards_tpu.utils.params import (
        EDWARDS_D,
        P,
        SUBGROUP_ORDER,
    )

    if not oracle.available():
        pytest.skip("liboracle.so not built")
    a = oracle.gen_points(64, seed=99)
    b = oracle.gen_points(64, seed=99)
    assert (a == b).all()
    c = oracle.gen_points(64, seed=100)
    assert not (a == c).all()

    for x, y in oracle.points_u64_to_ints(a[:8]):
        # a*x^2 + y^2 = 1 + d*x^2*y^2 with a = -1
        lhs = (-x * x + y * y) % P
        rhs = (1 + EDWARDS_D * x * x % P * y % P * y) % P
        assert lhs == rhs, "not on curve"
        pt = ExtPoint.from_affine(x, y)
        assert pt.mul(SUBGROUP_ORDER).to_affine() == (0, 1), "not in subgroup"
