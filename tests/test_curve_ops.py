"""Batched JAX curve ops vs the python ExtPoint oracle — the analogue of the
reference's point-add GPU benchmarks' CPU assertions
(reference: miscellaneous/add_points_benchmarks.ts)."""

import numpy as np
import jax.numpy as jnp

from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
from webgpu_msm_twisted_edwards_tpu.ops import curve as C
from webgpu_msm_twisted_edwards_tpu.utils import limbs as L
from webgpu_msm_twisted_edwards_tpu.utils.params import PARAMS

from conftest import random_points_scalars


def to_dev(points: list[ExtPoint]) -> C.PointXYTZ:
    """Pack python extended points into Montgomery-form device limbs."""
    xs = L.ints_to_limbs([PARAMS.to_mont(p.x) for p in points])
    ys = L.ints_to_limbs([PARAMS.to_mont(p.y) for p in points])
    ts = L.ints_to_limbs([PARAMS.to_mont(p.t) for p in points])
    zs = L.ints_to_limbs([PARAMS.to_mont(p.z) for p in points])
    return C.PointXYTZ(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts), jnp.asarray(zs))


def from_dev(pt: C.PointXYTZ) -> list[ExtPoint]:
    coords = [L.limbs_to_ints(np.asarray(a)) for a in (pt.x, pt.y, pt.t, pt.z)]
    return [
        ExtPoint(*(PARAMS.from_mont(c[i]) for c in coords))
        for i in range(len(coords[0]))
    ]


def affine(pts: list[ExtPoint]):
    return [p.to_affine() for p in pts]


def test_add_double_negate_vs_oracle():
    pa, _ = random_points_scalars(8, seed=11)
    pb, _ = random_points_scalars(8, seed=12)
    da, db = to_dev(pa), to_dev(pb)

    got = from_dev(C.add(da, db))
    want = [a.add(b) for a, b in zip(pa, pb)]
    assert affine(got) == affine(want)

    got = from_dev(C.double(da))
    assert affine(got) == affine([a.double() for a in pa])

    got = from_dev(C.negate(da))
    assert affine(got) == affine([a.neg() for a in pa])


def test_unified_add_handles_doubling_and_identity():
    pa, _ = random_points_scalars(4, seed=13)
    da = to_dev(pa)
    # P + P via unified add == double.
    got = from_dev(C.add(da, da))
    assert affine(got) == affine([a.double() for a in pa])
    # P + identity == P.
    ident = C.identity((4,))
    got = from_dev(C.add(da, ident))
    assert affine(got) == affine(pa)
    # identity + identity.
    got = from_dev(C.add(ident, ident))
    assert all(p.is_identity() for p in got)


def test_select_and_masked_add():
    pa, _ = random_points_scalars(4, seed=14)
    da = to_dev(pa)
    mask = jnp.asarray([True, False, True, False])
    acc = C.identity((4,))
    got = from_dev(C.add_masked(acc, da, mask))
    for i, p in enumerate(got):
        if i % 2 == 0:
            assert p.to_affine() == pa[i].to_affine()
        else:
            assert p.is_identity()


def test_scale_u32():
    pa, _ = random_points_scalars(6, seed=15)
    da = to_dev(pa)
    ks = [0, 1, 2, 255, 1000, 32768]
    got = from_dev(C.scale_u32(da, jnp.asarray(ks, dtype=jnp.uint32), num_bits=16))
    assert affine(got) == affine([p.mul(k) for p, k in zip(pa, ks)])


def test_gather_and_tree_reduce():
    pa, _ = random_points_scalars(7, seed=16)
    da = to_dev(pa)
    idx = jnp.asarray([3, 1, 4, 1, 5], dtype=jnp.int32)
    got = from_dev(C.gather(da, idx))
    assert affine(got) == affine([pa[i] for i in [3, 1, 4, 1, 5]])

    total = C.tree_reduce_axis(da, axis=0)
    want = pa[0]
    for p in pa[1:]:
        want = want.add(p)
    import jax

    [got_total] = from_dev(jax.tree_util.tree_map(lambda a: a[None], total))
    assert got_total.to_affine() == want.to_affine()
