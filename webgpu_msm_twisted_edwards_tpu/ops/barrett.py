"""Barrett modular multiplication over w-bit limb arrays (batched jnp).

Role parity with the reference's Barrett path, which it uses once per input
coordinate to enter Montgomery form (reference:
src/submission/implementation/wgsl/cuzk/barrett.template.wgsl:16-78 —
schoolbook full product, high-part estimate with slack, mu multiply, then up
to two correction subtractions).  The production TPU pipeline instead enters
Montgomery form with mont_mul(x, R^2) (ops/pallas/convert.py); this module
keeps the Barrett capability for parity and for the micro-benchmark suite
(reference: src/submission/miscellaneous/barrett_mul_benchmarks.ts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.params import PARAMS, FieldParams

U32 = jnp.uint32


def _const_limbs(v: int, num: int, w: int, dtype=np.uint32) -> np.ndarray:
    return np.array([(v >> (i * w)) & ((1 << w) - 1) for i in range(num)], dtype=dtype)


def mul_wide(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Schoolbook full product: [..., L] x [..., L] -> [..., 2L] normalized
    limbs (reference analogue: barrett.template.wgsl:16-32).  Column sums of
    up to L products of 2^(2w) fit u32 for w=13."""
    L = params.num_words
    w = params.word_size
    mask = U32(params.mask)
    cols = [None] * (2 * L)
    for k in range(2 * L):
        acc = None
        for i in range(max(0, k - L + 1), min(L, k + 1)):
            t = x[..., i] * y[..., k - i]
            acc = t if acc is None else acc + t
        cols[k] = acc if acc is not None else jnp.zeros_like(x[..., 0])
    # carry sweep
    out = []
    c = jnp.zeros_like(cols[0])
    for k in range(2 * L):
        v = cols[k] + c
        out.append(v & mask)
        c = v >> w
    return jnp.stack(out, axis=-1)


def _shift_right_bits(z: jnp.ndarray, bits: int, out_limbs: int, params: FieldParams) -> jnp.ndarray:
    """Right-shift a limb array by `bits`, returning `out_limbs` limbs."""
    w = params.word_size
    mask = U32(params.mask)
    limb_off = bits // w
    rem = bits % w
    nz = z.shape[-1]
    outs = []
    for i in range(out_limbs):
        src = i + limb_off
        lo = z[..., src] >> U32(rem) if src < nz else jnp.zeros_like(z[..., 0])
        if rem and src + 1 < nz:
            lo = lo | (z[..., src + 1] << U32(w - rem))
        outs.append(lo & mask)
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnames=("params",))
def barrett_mul(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """x*y mod p via Barrett reduction (no Montgomery form).

    Standard estimate: with s = bit length of p, mu = floor(2^(2s)/p),
    q = ((z >> (s-1)) * mu) >> (s+1); r = z - q*p needs at most two
    correction subtractions (reference analogue:
    barrett.template.wgsl:56-78 `field_mul`).
    """
    L = params.num_words
    w = params.word_size
    s = params.p.bit_length()
    mu = (1 << (2 * s)) // params.p
    mu_limbs = jnp.asarray(_const_limbs(mu, L + 1, w))
    p_limbs = jnp.asarray(_const_limbs(params.p, L, w))

    z = mul_wide(x, y, params)                                  # [..., 2L]
    zh = _shift_right_bits(z, s - 1, L + 1, params)             # z >> (s-1)
    # q_full = zh * mu (schoolbook over L+1 limbs), then >> (s+1).
    mask = U32(params.mask)
    n1 = L + 1
    cols = [None] * (2 * n1)
    for k in range(2 * n1):
        acc = None
        for i in range(max(0, k - n1 + 1), min(n1, k + 1)):
            t = zh[..., i] * mu_limbs[k - i]
            acc = t if acc is None else acc + t
        cols[k] = acc if acc is not None else jnp.zeros_like(zh[..., 0])
    qf = []
    c = jnp.zeros_like(cols[0])
    for k in range(2 * n1):
        v = cols[k] + c
        qf.append(v & mask)
        c = v >> w
    qfull = jnp.stack(qf, axis=-1)
    q = _shift_right_bits(qfull, s + 1, L, params)

    # r = z_low - q*p (only the low L+1 limbs matter; r < 3p < 2^(s+2)).
    qp = mul_wide(q, jnp.broadcast_to(p_limbs, q.shape), params)[..., : L + 1]
    zl = z[..., : L + 1]
    borrow = jnp.zeros_like(zl[..., 0])
    two_w = U32(1 << w)
    rl = []
    for i in range(L + 1):
        d = zl[..., i] + two_w - qp[..., i] - borrow
        borrow = U32(1) - (d >> w)
        rl.append(d & mask)
    r = jnp.stack(rl[:L], axis=-1)  # top limb is zero after corrections below

    # Up to two conditional subtractions of p.
    for _ in range(2):
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
