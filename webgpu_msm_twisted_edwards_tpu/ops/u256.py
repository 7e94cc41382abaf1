"""Independent naive device arithmetic: u256 words, non-Montgomery field ops.

A SECOND device-side arithmetic stack, deliberately sharing nothing with the
production 13-bit-limb Montgomery ops (`ops/pallas/common.py`, `ops/field.py`)
— the TPU analogue of the reference's naive WGSL stack, which keeps its own
u256 big-int library and a shift-and-add `field_multiply` entirely separate
from the optimized Montgomery submission (reference:
src/reference/webgpu/wgsl/U256.ts:30-221, FieldModulus.ts:60-88).  Racing
`tpu_naive_msm` (built on this module) against the production pipeline in the
dashboard therefore cross-checks the curve/field kernels with an
implementation that cannot share their bugs: different limb width (8x32 vs
20x13), different domain (plain vs Montgomery), different multiply algorithm
(double-and-add vs interleaved Montgomery), different reduction (conditional
subtract vs carry-free lazy).

Layout: a batch of field elements is an [8, B] uint32 array, words
little-endian on the sublane axis, batch on the lane axis (the only design
point borrowed from the production stack, since it is forced by the VPU
geometry, not by the arithmetic).  All values are kept strictly in [0, p).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.params import EDWARDS_D, P

U32 = jnp.uint32
WORDS = 8
#: Bit length of p (253): double-and-add multiply scans this many bits.
PBITS = P.bit_length()


def int_to_words(v: int) -> np.ndarray:
    return np.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(WORDS)],
                    dtype=np.uint32)


_P_WORDS = int_to_words(P)
_D_WORDS = int_to_words(EDWARDS_D)


def p_words(shape_b: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(_P_WORDS)[:, None], (WORDS, shape_b))


def u256_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod 2^256, word-wise with carry propagation (reference
    analogue: U256.ts u256_add).  Carries detected by unsigned wraparound."""
    out = []
    carry = jnp.zeros_like(a[0:1])
    for i in range(WORDS):
        s = a[i:i + 1] + b[i:i + 1]
        c1 = (s < a[i:i + 1]).astype(U32)
        s2 = s + carry
        c2 = (s2 < s).astype(U32)
        out.append(s2)
        carry = c1 + c2
    return jnp.concatenate(out, axis=0)


def u256_sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^256 with borrow propagation."""
    out = []
    borrow = jnp.zeros_like(a[0:1])
    for i in range(WORDS):
        d = a[i:i + 1] - b[i:i + 1]
        b1 = (d > a[i:i + 1]).astype(U32)
        d2 = d - borrow
        b2 = (d2 > d).astype(U32)
        out.append(d2)
        borrow = b1 + b2
    return jnp.concatenate(out, axis=0)


def u256_gte(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b, lexicographic most-significant-word first; [1, B] bool."""
    ge = jnp.ones_like(a[0:1], dtype=jnp.bool_)
    for i in range(WORDS):
        ge = (a[i:i + 1] > b[i:i + 1]) | ((a[i:i + 1] == b[i:i + 1]) & ge)
    return ge


def u256_double(a: jnp.ndarray) -> jnp.ndarray:
    """a << 1 mod 2^256 (cross-word carry from the top bit)."""
    hi = a >> 31
    shifted = a << 1
    carry_in = jnp.concatenate([jnp.zeros_like(hi[0:1]), hi[:-1]], axis=0)
    return shifted | carry_in


def field_reduce_once(a: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    """Conditional subtract of p (valid for a < 2p — every op below keeps
    values there, unlike the reference's while-loop which tolerates any u256;
    reference: FieldModulus.ts field_reduce)."""
    return jnp.where(u256_gte(a, pw), u256_sub(a, pw), a)


def field_add(a: jnp.ndarray, b: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    return field_reduce_once(u256_add(a, b), pw)


def field_sub(a: jnp.ndarray, b: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    lt = ~u256_gte(a, b)
    return jnp.where(lt, u256_sub(u256_add(a, pw), b), u256_sub(a, b))


def field_double(a: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    # a < p < 2^253 so the doubled value < 2^254 never wraps 2^256.
    return field_reduce_once(u256_double(a), pw)


def field_mul(a: jnp.ndarray, b: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    """Shift-and-add modular multiply — the reference's naive field_multiply
    (FieldModulus.ts:60-88) vectorized: acc += a<<i when bit i of b is set,
    reducing at every step, over p's 253 bits (the data-dependent while-loop
    becomes a fixed-trip fori_loop with per-lane selects)."""

    def body(i, state):
        acc, sh = state
        word = i // 32
        bit = jnp.uint32(i % 32)
        take = ((lax.dynamic_slice_in_dim(b, word, 1, axis=0) >> bit) & 1) == 1
        added = field_reduce_once(u256_add(acc, sh), pw)
        acc = jnp.where(take, added, acc)
        sh = field_double(sh, pw)
        return acc, sh

    acc0 = jnp.zeros_like(a)
    acc, _ = lax.fori_loop(0, PBITS, body, (acc0, a))
    return acc


def d_words(shape_b: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(_D_WORDS)[:, None], (WORDS, shape_b))


# ---------------------------------------------------------------------------
# Naive extended twisted Edwards point ops in the PLAIN (non-Montgomery)
# domain.  Points are (x, y, t, z) tuples of [8, B] word arrays.


def pt_identity_words(shape_b: int):
    zero = jnp.zeros((WORDS, shape_b), U32)
    one = zero.at[0].set(1)
    return (zero, one, zero, one)


def pt_add(p1, p2, pw, dw):
    """Unified add-2008-hwcd with a = -1, plain domain, 10 field_muls —
    the formula family the reference's naive point.multiply uses via the Aleo
    WASM curve (reference: naiveMSMEntry.ts point_mul), implemented directly
    on the u256 stack."""
    x1, y1, t1, z1 = p1
    x2, y2, t2, z2 = p2
    a = field_mul(field_sub(y1, x1, pw), field_sub(y2, x2, pw), pw)
    b = field_mul(field_add(y1, x1, pw), field_add(y2, x2, pw), pw)
    c = field_mul(field_mul(t1, t2, pw), dw, pw)
    c = field_double(c, pw)
    d = field_double(field_mul(z1, z2, pw), pw)
    e = field_sub(b, a, pw)
    f = field_sub(d, c, pw)
    g = field_add(d, c, pw)
    h = field_add(b, a, pw)
    return (field_mul(e, f, pw), field_mul(g, h, pw),
            field_mul(e, h, pw), field_mul(f, g, pw))


def pt_double(p1, pw):
    """dbl-2008-hwcd with a = -1, plain domain."""
    x1, y1, _t1, z1 = p1
    a = field_mul(x1, x1, pw)
    b = field_mul(y1, y1, pw)
    c = field_double(field_mul(z1, z1, pw), pw)
    # D = a*A with a = -1.
    d = field_sub(jnp.zeros_like(a), a, pw)
    xy = field_add(x1, y1, pw)
    e = field_sub(field_sub(field_mul(xy, xy, pw), a, pw), b, pw)
    g = field_add(d, b, pw)
    f = field_sub(g, c, pw)
    h = field_sub(d, b, pw)
    return (field_mul(e, f, pw), field_mul(g, h, pw),
            field_mul(e, h, pw), field_mul(f, g, pw))


def pt_select(mask, a, b):
    return tuple(jnp.where(mask, ai, bi) for ai, bi in zip(a, b))


def naive_msm_words(coords_u32: jnp.ndarray, scalars_u32: jnp.ndarray,
                    bits: int = 256):
    """Naive MSM on the independent stack: [n, 2, 8] plain affine coordinate
    words + [n, 8] scalar words -> ONE (x, y, t, z) of [8, 1] word arrays
    (plain domain, projective).  Per-point double-and-add over `bits` scalar
    bits (MSB first), then a log-depth tree sum — the shape of the
    reference's naive GPU baseline (one point.multiply per input,
    naiveMSMEntry.ts:38-260)."""
    n = coords_u32.shape[0]
    pw = p_words(n)
    dw = d_words(n)
    x = coords_u32[:, 0, :].T               # [8, n] LE words
    y = coords_u32[:, 1, :].T
    t = field_mul(x, y, pw)
    z = jnp.zeros((WORDS, n), U32).at[0].set(1)
    base = (x, y, t, z)
    sc = scalars_u32.T                      # [8, n]

    def bit_step(i, acc):
        idx = bits - 1 - i
        word = idx // 32
        bit = jnp.uint32(idx % 32)
        take = ((lax.dynamic_slice_in_dim(sc, word, 1, axis=0) >> bit) & 1) == 1
        acc = pt_double(acc, pw)
        return pt_select(take, pt_add(acc, base, pw, dw), acc)

    acc = lax.fori_loop(0, bits, bit_step, pt_identity_words(n))

    # Log-depth pairwise tree sum (n is padded to a power of two by halving).
    def tree(acc, m):
        while m > 1:
            half = m // 2
            lo = tuple(a[:, :half] for a in acc)
            hi = tuple(a[:, half:half * 2] for a in acc)
            pwh = p_words(half)
            dwh = d_words(half)
            merged = pt_add(lo, hi, pwh, dwh)
            if m % 2:
                tail = tuple(a[:, m - 1:m] for a in acc)
                merged = tuple(jnp.concatenate([a, b], axis=1)
                               for a, b in zip(merged, tail))
                m = half + 1
            else:
                m = half
            acc = merged
        return acc

    return tree(acc, n)
