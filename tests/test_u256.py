"""The independent naive device arithmetic (ops/u256.py): plain-domain u256 /
field ops and the naive curve ops, checked against python big ints — the
analogue of the reference's u256/FieldModulus WGSL tests
(reference: src/reference/webgpu tests of U256.ts / FieldModulus.ts)."""

import numpy as np
import jax.numpy as jnp

from webgpu_msm_twisted_edwards_tpu.ops import u256 as U
from webgpu_msm_twisted_edwards_tpu.utils.params import EDWARDS_D, P


def _to_dev(vals):
    """list of ints -> [8, B] word array."""
    return jnp.asarray(np.stack([U.int_to_words(v) for v in vals], axis=1))


def _to_ints(arr):
    a = np.asarray(arr)
    return [sum(int(a[i, j]) << (32 * i) for i in range(U.WORDS))
            for j in range(a.shape[1])]


def test_u256_add_sub_double():
    rng = np.random.default_rng(0)
    xs = [int(rng.integers(0, 1 << 62)) ** 4 % (1 << 256) for _ in range(8)]
    ys = [int(rng.integers(0, 1 << 62)) ** 4 % (1 << 256) for _ in range(8)]
    a, b = _to_dev(xs), _to_dev(ys)
    assert _to_ints(U.u256_add(a, b)) == [(x + y) % (1 << 256) for x, y in zip(xs, ys)]
    assert _to_ints(U.u256_sub(a, b)) == [(x - y) % (1 << 256) for x, y in zip(xs, ys)]
    assert _to_ints(U.u256_double(a)) == [(2 * x) % (1 << 256) for x in xs]
    got = np.asarray(U.u256_gte(a, b))[0]
    assert got.tolist() == [x >= y for x, y in zip(xs, ys)]


def test_field_ops_match_python():
    rng = np.random.default_rng(1)
    xs = [int(rng.integers(0, 1 << 62)) ** 4 % P for _ in range(8)]
    ys = [int(rng.integers(0, 1 << 62)) ** 4 % P for _ in range(8)]
    a, b = _to_dev(xs), _to_dev(ys)
    pw = U.p_words(8)
    assert _to_ints(U.field_add(a, b, pw)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert _to_ints(U.field_sub(a, b, pw)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert _to_ints(U.field_double(a, pw)) == [(2 * x) % P for x in xs]
    import jax

    mul = jax.jit(U.field_mul)
    assert _to_ints(mul(a, b, pw)) == [(x * y) % P for x, y in zip(xs, ys)]
    # Edge cases: 0, 1, p-1.
    xs = [0, 1, P - 1, P - 1]
    ys = [P - 1, P - 1, P - 1, 1]
    a, b = _to_dev(xs), _to_dev(ys)
    pw = U.p_words(4)
    assert _to_ints(mul(a, b, pw)) == [(x * y) % P for x, y in zip(xs, ys)]


def test_naive_curve_add_double_match_cpu_reference():
    """pt_add / pt_double (plain domain) against the python ExtPoint ops."""
    from conftest import random_points_scalars

    pts, _ = random_points_scalars(4, seed=33)
    aff = [p.to_affine() for p in pts]
    xs = _to_dev([a[0] for a in aff])
    ys = _to_dev([a[1] for a in aff])
    ts = _to_dev([a[0] * a[1] % P for a in aff])
    zs = _to_dev([1] * 4)
    pw, dw = U.p_words(4), U.d_words(4)
    import jax

    add = jax.jit(U.pt_add)
    dbl = jax.jit(U.pt_double)
    x3, y3, t3, z3 = add((xs, ys, ts, zs), (xs, ys, ts, zs), pw, dw)
    # Unified add on equal inputs == doubling.
    want = [p.add(p).to_affine() for p in pts]
    for j in range(4):
        z = _to_ints(z3)[j]
        zi = pow(z, P - 2, P)
        assert (_to_ints(x3)[j] * zi % P, _to_ints(y3)[j] * zi % P) == want[j]
    x2, y2, _t2, z2 = dbl((xs, ys, ts, zs), pw)
    for j in range(4):
        z = _to_ints(z2)[j]
        zi = pow(z, P - 2, P)
        assert (_to_ints(x2)[j] * zi % P, _to_ints(y2)[j] * zi % P) == want[j]


def test_naive_msm_matches_oracle():
    """End-to-end tpu_naive_msm (independent stack) vs the native oracle —
    two implementations sharing nothing device-side."""
    import pytest

    from conftest import random_points_scalars
    from webgpu_msm_twisted_edwards_tpu.models.baselines import tpu_naive_msm
    from webgpu_msm_twisted_edwards_tpu.utils import oracle

    if not oracle.available():
        pytest.skip("liboracle.so not built")
    pts, scalars = random_points_scalars(5, seed=34)   # odd n: tree-sum tail
    aff = [p.to_affine() for p in pts]
    res = tpu_naive_msm(aff, scalars)
    assert (res["x"], res["y"]) == oracle.msm(aff, scalars)


def test_edwards_d_plain():
    assert EDWARDS_D == 3021  # ed-on-bls12-377 (reference: params)
