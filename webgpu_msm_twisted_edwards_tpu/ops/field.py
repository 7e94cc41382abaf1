"""Vectorized limb-based finite-field arithmetic for TPU (jax.numpy path).

Field elements are uint32 arrays of shape [..., NUM_WORDS] holding WORD_SIZE-bit
little-endian limbs (w=13, 20 limbs by default).  All functions are batch-first:
every limb-level loop is a *static* Python loop unrolled at trace time, and all
parallelism comes from the leading batch dimensions mapping onto VPU lanes.

This is the TPU-native re-design of the reference's WGSL field libraries:
 - bigint add/sub/gt     (reference: src/submission/implementation/wgsl/bigint/bigint.template.wgsl)
 - fr_add/fr_sub/reduce  (reference: wgsl/field/field.template.wgsl)
 - montgomery_product    (reference: wgsl/montgomery/mont_pro_product.template.wgsl:15-57,
                          the carry-free nsafe=32 variant)

Design note: the reference enters Montgomery form with a Barrett multiplication
by R (wgsl/cuzk/barrett.template.wgsl:56-78).  Here we instead compute
mont_mul(x, R^2 mod p) which is mathematically identical, cheaper, and needs no
extra code path; a Barrett implementation is kept in `barrett.py` for parity
benchmarks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.params import PARAMS, FieldParams

U32 = jnp.uint32


def _const_limbs(value: int, params: FieldParams) -> np.ndarray:
    out = np.empty(params.num_words, dtype=np.uint32)
    for i in range(params.num_words):
        out[i] = (value >> (i * params.word_size)) & params.mask
    return out


def p_limbs(params: FieldParams = PARAMS) -> jnp.ndarray:
    return jnp.asarray(_const_limbs(params.p, params), dtype=U32)


def r2_limbs(params: FieldParams = PARAMS) -> jnp.ndarray:
    return jnp.asarray(_const_limbs(params.r2, params), dtype=U32)


def r_limbs(params: FieldParams = PARAMS) -> jnp.ndarray:
    """R mod p — the Montgomery form of 1."""
    return jnp.asarray(_const_limbs(params.r, params), dtype=U32)


def one_limbs(params: FieldParams = PARAMS) -> jnp.ndarray:
    return jnp.asarray(_const_limbs(1, params), dtype=U32)


def zero(shape, params: FieldParams = PARAMS) -> jnp.ndarray:
    return jnp.zeros((*shape, params.num_words), dtype=U32)


@partial(jax.jit, static_argnames=("params",))
def geq(a: jnp.ndarray, b: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Limbwise a >= b, vectorized over batch dims.  Scans from the least
    significant limb: ge = (a_i > b_i) | (a_i == b_i & ge)."""
    ge = jnp.ones(a.shape[:-1], dtype=jnp.bool_)
    for i in range(params.num_words):
        ai, bi = a[..., i], b[..., i]
        ge = (ai > bi) | ((ai == bi) & ge)
    return ge


def _carry_sweep(s: jnp.ndarray, params: FieldParams) -> jnp.ndarray:
    """Propagate carries so that every limb < 2^w.  Input limbs may hold up to
    32-bit values (the analogue of the reference's final carry loop,
    mont_pro_product.template.wgsl:36-41).  Rolled as a `lax.scan` over limbs
    to keep the traced graph small (XLA compile time is the TPU analogue of
    shader-compile time; see SURVEY.md §7 risk 5)."""
    w = params.word_size
    mask = U32(params.mask)

    def step(c, si):
        v = si + c
        return v >> w, v & mask

    _, out = jax.lax.scan(step, jnp.zeros(s.shape[:-1], dtype=U32), jnp.moveaxis(s, -1, 0))
    return jnp.moveaxis(out, 0, -1)


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray, params: FieldParams) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) with borrow propagation over normalized limbs; returns
    (difference limbs, final borrow flag)."""
    w = params.word_size
    mask = U32(params.mask)
    two_w = U32(1 << w)

    def step(borrow, ab):
        ai, bi = ab
        d = ai + two_w - bi - borrow
        return U32(1) - (d >> w), d & mask

    a, b = jnp.broadcast_arrays(a, b)
    borrow, out = jax.lax.scan(
        step,
        jnp.zeros(a.shape[:-1], dtype=U32),
        (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)),
    )
    return jnp.moveaxis(out, 0, -1), borrow


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray, params: FieldParams) -> jnp.ndarray:
    """(a + b) with carry propagation (no reduction)."""
    return _carry_sweep(a + b, params)


@partial(jax.jit, static_argnames=("params",))
def cond_sub_p(a: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """If a >= p, return a - p, else a (normalizes into [0, p))."""
    pv = p_limbs(params)
    pb = jnp.broadcast_to(pv, a.shape)
    diff, _ = _sub_limbs(a, pb, params)
    return jnp.where(geq(a, pb, params)[..., None], diff, a)


@partial(jax.jit, static_argnames=("params",))
def add(a: jnp.ndarray, b: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Field addition mod p (reference: field.template.wgsl fr_add)."""
    return cond_sub_p(_add_limbs(a, b, params), params)


@partial(jax.jit, static_argnames=("params",))
def sub(a: jnp.ndarray, b: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Field subtraction mod p (reference: field.template.wgsl fr_sub): compute
    a - b; on borrow, add p."""
    diff, borrow = _sub_limbs(a, b, params)
    pv = jnp.broadcast_to(p_limbs(params), a.shape)
    plus_p = _add_limbs(diff, pv, params)
    return jnp.where((borrow == 1)[..., None], plus_p, diff)


@partial(jax.jit, static_argnames=("params",))
def neg(a: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """-a mod p, with neg(0) == 0."""
    return sub(jnp.zeros_like(a), a, params)


@partial(jax.jit, static_argnames=("params",))
def mont_mul(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Montgomery product: x*y*R^-1 mod p over w-bit limbs.

    TPU re-design of the carry-free interleaved algorithm
    (reference: mont_pro_product.template.wgsl:15-44).  With w=13 and 20 limbs,
    each uint32 accumulator absorbs 2 products of < 2^26 per iteration for all
    20 iterations (nsafe=32 >= num_words) so no intra-loop carries are needed;
    a single carry sweep runs at the end.  The limb loop is unrolled at trace
    time; all lanes are batch.
    """
    assert x.shape[-1] == params.num_words
    assert params.nsafe >= params.num_words, "carry-free variant requires nsafe >= num_words"
    w = params.word_size
    mask = U32(params.mask)
    n0 = U32(params.n0)
    pv = p_limbs(params)

    bshape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    x = jnp.broadcast_to(x, (*bshape, params.num_words))
    y = jnp.broadcast_to(y, (*bshape, params.num_words))
    s0 = jnp.zeros((*bshape, params.num_words), dtype=U32)
    zcol = jnp.zeros((*bshape, 1), dtype=U32)

    def step(s, xi):
        t = s[..., 0] + xi * y[..., 0]
        qi = (n0 * (t & mask)) & mask
        u = s + xi[..., None] * y + qi[..., None] * pv
        c = u[..., 0] >> w
        head = (u[..., 1] + c)[..., None]
        return jnp.concatenate([head, u[..., 2:], zcol], axis=-1), None

    s, _ = jax.lax.scan(step, s0, jnp.moveaxis(x, -1, 0))
    s = _carry_sweep(s, params)
    return cond_sub_p(s, params)


@partial(jax.jit, static_argnames=("params",))
def to_mont(x: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Enter Montgomery form: x*R mod p == mont_mul(x, R^2)."""
    return mont_mul(x, jnp.broadcast_to(r2_limbs(params), x.shape), params)


@partial(jax.jit, static_argnames=("params",))
def from_mont(x: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Leave Montgomery form: x*R^-1 mod p == mont_mul(x, 1)."""
    return mont_mul(x, jnp.broadcast_to(one_limbs(params), x.shape), params)


@partial(jax.jit, static_argnames=("params",))
def mont_sqr(x: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    return mont_mul(x, x, params)


@partial(jax.jit, static_argnames=("params",))
def mont_inv(x: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Montgomery-domain modular inverse via Fermat: x^(p-2), MSB-first
    square-and-multiply with the (compile-time constant) exponent bits driven
    by a fori_loop, so the graph stays small.  Domain-preserving: given
    rep(a) = a*R returns rep(a^-1).  mont_inv(0) == 0 (0^(p-2) = 0).

    The reference's only inverse is the CPU-side binary extended-Euclid in
    its baseline WGSL field lib (reference:
    src/reference/webgpu/wgsl/FieldModulus.ts:119-164); the production path
    never inverts on-device.  The TPU framework needs one for the fixed-base
    precompute's batch affine normalization (ops/precompute.py)."""
    e = params.p - 2
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                       dtype=jnp.uint32)
    acc0 = jnp.broadcast_to(r_limbs(params), x.shape)

    def body(i, acc):
        acc = mont_mul(acc, acc, params)
        taken = mont_mul(acc, x, params)
        return select(bits[i] == 1, taken, acc)

    return jax.lax.fori_loop(0, nbits, body, acc0)


@partial(jax.jit, static_argnames=("params",))
def mont_inv_batch(z: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Batched Montgomery-domain inverse of [..., N, num_words] along axis -2
    via the Montgomery batch-inversion trick: log-depth prefix and suffix
    products (associative scans), ONE Fermat inverse of the total, then two
    products per element — ~6N multiplies total instead of N full Fermat
    chains (~500N).  Zero elements invert to zero without poisoning the
    batch (they are masked out of the products)."""
    zero_mask = is_zero(z)
    one = jnp.broadcast_to(r_limbs(params), z.shape)
    zs = select(zero_mask, one, z)
    mul = partial(mont_mul, params=params)
    ax = zs.ndim - 2                   # reverse=True rejects negative axes
    prefix = jax.lax.associative_scan(mul, zs, axis=ax)
    suffix = jax.lax.associative_scan(mul, zs, axis=ax, reverse=True)
    total_inv = mont_inv(prefix[..., -1:, :], params)
    left = jnp.concatenate([one[..., :1, :], prefix[..., :-1, :]], axis=-2)
    right = jnp.concatenate([suffix[..., 1:, :], one[..., :1, :]], axis=-2)
    inv = mul(mul(jnp.broadcast_to(total_inv, z.shape), left), right)
    return select(zero_mask, jnp.zeros_like(z), inv)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where over field elements; mask has batch shape (no limb dim)."""
    return jnp.where(mask[..., None], a, b)
