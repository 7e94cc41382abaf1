"""Barrett-Domb modular multiplication over w-bit limb arrays (batched jnp).

Device counterpart of the reference's explored Barrett-Domb reduction
(reference: src/submission/miscellaneous/wgsl/barrett_domb.template.wgsl:1-188
and barrett_domb.ts:258-323, itself adapted from Ingonyama's
modular_multiplication repo): computes x*y mod p without Montgomery form.
The quotient estimate uses only the most-significant half of the product —
an MSB-half schoolbook multiply by the precomputed constant
m = floor(2^(2s+z) / p) (s = bit length of p, z = limb slack) — and the
remainder needs only the least-significant half of l*p, so the two half
multiplies together cost about one full product.

Batch-first vectorized like ops/barrett.py; used by the micro-benchmark suite
to race Montgomery vs Barrett vs Barrett-Domb on TPU (the reference's
barrett_domb_mul_benchmarks.ts).  The w=13 design point never takes the
extra-diagonal branch (z=7 ≥ log2(4 + L/2^z)); asserted below.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.params import PARAMS, FieldParams
from .barrett import U32, _const_limbs, _shift_right_bits, mul_wide


def msb_mul(a: jnp.ndarray, b_limbs: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """MSB-half schoolbook product: floor-estimate of (a*b) >> (L*w) using
    only partial-product columns i+j >= L-1 (the same approximation as the
    reference's mp_msb_multiply; its error is compensated by the slack bits).
    a: [..., L]; b_limbs: [L] constant.  Returns [..., L]."""
    L = params.num_words
    w = params.word_size
    mask = U32(params.mask)
    # Column sums: ≤ L products of < 2^(2w) each — fits u32 for w=13.
    cols = [None] * L  # col v accumulates products with i+j = L-1+v
    for i in range(L):
        for j in range(L):
            if i + j >= L - 1:
                v = i + j - (L - 1)
                t = a[..., i] * b_limbs[j]
                cols[v] = t if cols[v] is None else cols[v] + t
    out = []
    c = jnp.zeros_like(a[..., 0])
    for v in range(L):
        s = cols[v] + c
        out.append(s & mask)
        c = s >> w
    out.append(c & mask)
    # Drop the partial column 0 (>> w): limbs 1..L are the estimate.
    return jnp.stack(out[1 : L + 1], axis=-1)


def lsb_mul(a: jnp.ndarray, b_limbs: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """LSB-half schoolbook product: (a*b) mod 2^(L*w) (columns i+j < L).
    a: [..., L]; b_limbs: [L] constant.  Returns [..., L]."""
    L = params.num_words
    w = params.word_size
    mask = U32(params.mask)
    cols = [None] * L
    for i in range(L):
        for j in range(L - i):
            t = a[..., i] * b_limbs[j]
            cols[i + j] = t if cols[i + j] is None else cols[i + j] + t
    out = []
    c = jnp.zeros_like(a[..., 0])
    for k in range(L):
        s = cols[k] + c
        out.append(s & mask)
        c = s >> w
    return jnp.stack(out, axis=-1)


@partial(jax.jit, static_argnames=("params",))
def barrett_domb_mul(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """x*y mod p via the Domb variant of Barrett reduction.

    Pipeline (reference: barrett_domb.ts:258-323, w=13 branch):
    ab = x*y; ab_msb = floor(ab * 2^(2z) / 2^(L*w));
    l = floor((msb_mul(ab_msb, m_low) + ab_msb) / 2^z)   (m's top bit is 1);
    r = (ab - l*p) mod 2^(L*w), then conditional subtractions of p.
    """
    L = params.num_words
    w = params.word_size
    s = params.p.bit_length()
    z = L * w - s
    # The reference's extra-diagonal branch is only needed when the slack is
    # tiny (w=15/16 limb experiments); the shipped w=13 point never takes it.
    assert z >= math.log2(4 + L / 2**z), "extra-diagonal branch not implemented"
    m = params.barrett_domb_m
    assert m >> (L * w) == 1, "m must have exactly one bit above L*w"
    m_low = jnp.asarray(_const_limbs(m - (1 << (L * w)), L, w))
    p_limbs = jnp.asarray(_const_limbs(params.p, L, w))

    ab = mul_wide(x, y, params)                                  # [..., 2L]
    ab_msb = _shift_right_bits(ab, L * w - 2 * z, L, params)     # [..., L]
    t = msb_mul(ab_msb, m_low, params)
    # l_full = t + ab_msb (mod 2^(L*w)); then >> z.
    mask = U32(params.mask)
    two_w = U32(1 << w)
    lf = []
    c = jnp.zeros_like(t[..., 0])
    for i in range(L):
        v = t[..., i] + ab_msb[..., i] + c
        lf.append(v & mask)
        c = v >> w
    l = _shift_right_bits(jnp.stack(lf, axis=-1), z, L, params)

    ls = lsb_mul(l, p_limbs, params)
    # r = (ab_low - ls) mod 2^(L*w): the true remainder is a small multiple
    # of p plus the residue, far below 2^(L*w), so the wrap never fires.
    rl = []
    borrow = jnp.zeros_like(ls[..., 0])
    for i in range(L):
        d = ab[..., i] + two_w - ls[..., i] - borrow
        borrow = U32(1) - (d >> w)
        rl.append(d & mask)
    r = jnp.stack(rl, axis=-1)

    # Conditional subtractions (the reference loops while r > p and may
    # return the unreduced representative p; we fully reduce to [0, p)).
    # Three iterations suffice because the Domb quotient estimate drops at
    # most 2 multiples of p (l underestimates ab/p by < 2 for z >= 1 — the
    # msb-multiply truncation error plus the floor; Domb 2019 §3), so the
    # remainder is < 3p before correction and one extra iteration is margin.
    # Re-derive this bound before changing w, z, or the msb_mul truncation.
    assert params.num_words * params.word_size - params.p.bit_length() >= 1, (
        "Domb remainder bound (r < 3p) assumes slack z >= 1"
    )
    for _ in range(3):
        ge = jnp.ones_like(r[..., 0], dtype=jnp.bool_)
        for i in range(L):
            ge = (r[..., i] > p_limbs[i]) | ((r[..., i] == p_limbs[i]) & ge)
        borrow = jnp.zeros_like(r[..., 0])
        sub = []
        for i in range(L):
            d = r[..., i] + two_w - p_limbs[i] - borrow
            borrow = U32(1) - (d >> w)
            sub.append(d & mask)
        r = jnp.where(ge[..., None], jnp.stack(sub, axis=-1), r)
    return r
