"""JAX limb field arithmetic vs the python bigint oracle — the analogue of the
reference's Montgomery shader checks (reference:
miscellaneous/mont_mul_benchmarks.ts:218-223 GPU-vs-CPU assertions)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from webgpu_msm_twisted_edwards_tpu.ops import field as F
from webgpu_msm_twisted_edwards_tpu.utils import limbs as L
from webgpu_msm_twisted_edwards_tpu.utils.params import P, PARAMS


def _rand_elems(n, seed=0, bound=P):
    r = random.Random(seed)
    return [r.randrange(bound) for _ in range(n)]


def _to_dev(vals):
    return jnp.asarray(L.ints_to_limbs(vals))


def _back(arr):
    return L.limbs_to_ints(np.asarray(arr))


def test_add_sub():
    n = 64
    a_i, b_i = _rand_elems(n, 1), _rand_elems(n, 2)
    a, b = _to_dev(a_i), _to_dev(b_i)
    assert _back(F.add(a, b)) == [(x + y) % P for x, y in zip(a_i, b_i)]
    assert _back(F.sub(a, b)) == [(x - y) % P for x, y in zip(a_i, b_i)]
    assert _back(F.neg(a)) == [(-x) % P for x in a_i]
    # Edge cases: 0, p-1.
    edge = [0, P - 1, 1, P - 1]
    eo = [P - 1, 0, P - 1, P - 1]
    assert _back(F.add(_to_dev(edge), _to_dev(eo))) == [(x + y) % P for x, y in zip(edge, eo)]
    assert _back(F.sub(_to_dev(edge), _to_dev(eo))) == [(x - y) % P for x, y in zip(edge, eo)]


def test_geq():
    a_i = [5, 5, 4, P - 1, 0]
    b_i = [5, 4, 5, 0, P - 1]
    got = np.asarray(F.geq(_to_dev(a_i), _to_dev(b_i)))
    assert got.tolist() == [True, True, False, True, False]


def test_mont_mul_random():
    n = 256
    a_i, b_i = _rand_elems(n, 3), _rand_elems(n, 4)
    am = [(x * PARAMS.r_full) % P for x in a_i]
    bm = [(x * PARAMS.r_full) % P for x in b_i]
    got = _back(F.mont_mul(_to_dev(am), _to_dev(bm)))
    want = [(x * y % P) * PARAMS.r_full % P for x, y in zip(a_i, b_i)]
    assert got == want


def test_mont_mul_edge():
    vals = [0, 1, P - 1, PARAMS.r, PARAMS.r2, (P - 1)]
    other = [P - 1, P - 1, P - 1, 1, 1, 0]
    got = _back(F.mont_mul(_to_dev(vals), _to_dev(other)))
    want = [(x * y % P) * PARAMS.rinv % P for x, y in zip(vals, other)]
    assert got == want


def test_to_from_mont():
    n = 64
    a_i = _rand_elems(n, 5)
    a = _to_dev(a_i)
    am = F.to_mont(a)
    assert _back(am) == [x * PARAMS.r_full % P for x in a_i]
    assert _back(F.from_mont(am)) == a_i


def test_jit_and_vmap_compat():
    a_i = _rand_elems(8, 6)
    a = _to_dev(a_i)
    f = jax.jit(lambda x: F.from_mont(F.to_mont(x)))
    assert _back(f(a)) == a_i
    # 2D batch shape.
    a2 = a.reshape(2, 4, -1)
    assert _back(F.add(a2, a2).reshape(8, -1)) == [2 * x % P for x in a_i]
