"""Batched extended twisted Edwards point arithmetic in Montgomery form.

Points are pytrees of four uint32 limb arrays [..., NUM_WORDS] (X, Y, T, Z),
all coordinates in Montgomery form.  Every op is vectorized over the batch
dims — the TPU-native re-design of the reference's WGSL curve library
(reference: src/submission/implementation/wgsl/curve/ec.template.wgsl:7-66,
add-2008-hwcd and dbl-2008-hwcd with a = -1 folded in).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.params import PARAMS, FieldParams
from . import field as F


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PointXYTZ:
    """A batch of extended twisted Edwards points, Montgomery-form limbs."""

    x: jnp.ndarray
    y: jnp.ndarray
    t: jnp.ndarray
    z: jnp.ndarray

    def tree_flatten(self):
        return (self.x, self.y, self.t, self.z), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def batch_shape(self):
        return self.x.shape[:-1]

    def __getitem__(self, idx) -> "PointXYTZ":
        return PointXYTZ(self.x[idx], self.y[idx], self.t[idx], self.z[idx])


def edwards_d_mont_limbs(params: FieldParams = PARAMS) -> jnp.ndarray:
    out = np.empty(params.num_words, dtype=np.uint32)
    for i in range(params.num_words):
        out[i] = (params.edwards_d_mont >> (i * params.word_size)) & params.mask
    return jnp.asarray(out)


def identity(batch_shape=(), params: FieldParams = PARAMS) -> PointXYTZ:
    """The neutral element (0 : 1 : 0 : 1) in Montgomery form: (0, R, 0, R)."""
    r = jnp.broadcast_to(F.r_limbs(params), (*batch_shape, params.num_words))
    z = jnp.zeros((*batch_shape, params.num_words), dtype=F.U32)
    return PointXYTZ(z, r, z, r)


@partial(jax.jit, static_argnames=("params",))
def add(p1: PointXYTZ, p2: PointXYTZ, params: FieldParams = PARAMS) -> PointXYTZ:
    """add-2008-hwcd, 9M + 2D, unified (valid for doubling and identity since
    a=-1 is a QR and d a non-residue mod p).
    Reference analogue: ec.template.wgsl:34-66."""
    mm = lambda a, b: F.mont_mul(a, b, params)
    a = mm(p1.x, p2.x)
    b = mm(p1.y, p2.y)
    t2 = mm(p1.t, p2.t)
    c = mm(jnp.broadcast_to(edwards_d_mont_limbs(params), t2.shape), t2)
    d = mm(p1.z, p2.z)
    e = F.sub(mm(F.add(p1.x, p1.y, params), F.add(p2.x, p2.y, params)), F.add(a, b, params), params)
    f = F.sub(d, c, params)
    g = F.add(d, c, params)
    h = F.add(b, a, params)  # B - aA with a = -1
    return PointXYTZ(mm(e, f), mm(g, h), mm(e, h), mm(f, g))


@partial(jax.jit, static_argnames=("params",))
def double(p1: PointXYTZ, params: FieldParams = PARAMS) -> PointXYTZ:
    """dbl-2008-hwcd (reference analogue: ec.template.wgsl:7-30)."""
    mm = lambda a, b: F.mont_mul(a, b, params)
    a = mm(p1.x, p1.x)
    b = mm(p1.y, p1.y)
    zz = mm(p1.z, p1.z)
    c = F.add(zz, zz, params)
    d = F.neg(a, params)  # a coefficient = -1
    xy = F.add(p1.x, p1.y, params)
    e = F.sub(mm(xy, xy), F.add(a, b, params), params)
    g = F.add(d, b, params)
    f = F.sub(g, c, params)
    h = F.sub(d, b, params)
    return PointXYTZ(mm(e, f), mm(g, h), mm(e, h), mm(f, g))


@partial(jax.jit, static_argnames=("params",))
def negate(p: PointXYTZ, params: FieldParams = PARAMS) -> PointXYTZ:
    """(X, Y, T, Z) -> (-X, Y, -T, Z) (reference analogue: the signed-bucket
    negation in smvp.template.wgsl:47-56)."""
    return PointXYTZ(F.neg(p.x, params), p.y, F.neg(p.t, params), p.z)


def select(mask: jnp.ndarray, a: PointXYTZ, b: PointXYTZ) -> PointXYTZ:
    """Elementwise point select: mask True -> a, else b."""
    return PointXYTZ(
        F.select(mask, a.x, b.x),
        F.select(mask, a.y, b.y),
        F.select(mask, a.t, b.t),
        F.select(mask, a.z, b.z),
    )


@partial(jax.jit, static_argnames=("params",))
def add_masked(acc: PointXYTZ, p: PointXYTZ, valid: jnp.ndarray, params: FieldParams = PARAMS) -> PointXYTZ:
    """acc + (valid ? p : identity) — used for padded/masked lanes."""
    ident = identity(valid.shape, params)
    return add(acc, select(valid, p, ident), params)


@partial(jax.jit, static_argnames=("num_bits", "params"))
def scale_u32(p: PointXYTZ, k: jnp.ndarray, num_bits: int, params: FieldParams = PARAMS) -> PointXYTZ:
    """Per-lane scalar multiplication k*P for small (< 2^num_bits) uint32
    scalars, MSB-first double-and-add with static trip count.

    Reference analogue: the double_and_add fix-up in BPR stage 2
    (bpr.template.wgsl:47-62), re-shaped for SIMD: all lanes run all bits with
    a select instead of divergent branches.
    """
    from jax import lax

    acc0 = identity(p.batch_shape, params)

    def body(i, acc):
        bit = jnp.uint32(num_bits - 1) - jnp.uint32(i)
        acc = double(acc, params)
        take = ((k >> bit) & jnp.uint32(1)) == 1
        return select(take, add(acc, p, params), acc)

    return lax.fori_loop(0, num_bits, body, acc0)


def gather(points: PointXYTZ, idx: jnp.ndarray) -> PointXYTZ:
    """Gather a batch of points from a [n, ...] point table by integer index
    array (any shape)."""
    return PointXYTZ(points.x[idx], points.y[idx], points.t[idx], points.z[idx])


def tree_reduce_axis(p: PointXYTZ, axis: int, params: FieldParams = PARAMS) -> PointXYTZ:
    """Log-depth pairwise reduction (EC sum) along `axis` of the batch dims.

    Reference analogue: the tree-sum shader
    (miscellaneous/wgsl/bucket_points_reduction.template.wgsl).  To keep the
    compiled graph small the halving loop is *rolled*: a single masked-add body
    runs ceil(log2(n)) times over a fixed-shape buffer via `fori_loop` (only
    the single EC-add body is compiled once).
    """
    from jax import lax

    n = p.x.shape[axis]
    if n == 1:
        return p[tuple([slice(None)] * axis + [0])]

    # Move the reduce axis to the front and pad to a power of two with identity.
    def mov(a):
        return jnp.moveaxis(a, axis, 0)

    q = PointXYTZ(mov(p.x), mov(p.y), mov(p.t), mov(p.z))
    m = 1 << (n - 1).bit_length()
    if m != n:
        pad = identity((m - n, *q.x.shape[1:-1]), params)
        q = PointXYTZ(
            jnp.concatenate([q.x, pad.x], axis=0),
            jnp.concatenate([q.y, pad.y], axis=0),
            jnp.concatenate([q.t, pad.t], axis=0),
            jnp.concatenate([q.z, pad.z], axis=0),
        )

    steps = m.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    def body(s, acc):
        offset = jnp.int32(m) >> (s + 1)
        # partner[i] = acc[i + offset] (wrapped values are masked off below).
        rolled = PointXYTZ(
            jnp.roll(acc.x, -offset, axis=0),
            jnp.roll(acc.y, -offset, axis=0),
            jnp.roll(acc.t, -offset, axis=0),
            jnp.roll(acc.z, -offset, axis=0),
        )
        merged = add(acc, rolled, params)
        lane_mask = jnp.reshape(lane < offset, (m,) + (1,) * (acc.x.ndim - 2))
        return select(jnp.broadcast_to(lane_mask, acc.x.shape[:-1]), merged, acc)

    out = lax.fori_loop(0, steps, body, q)
    return out[0]
