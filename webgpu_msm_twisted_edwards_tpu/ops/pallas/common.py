"""In-kernel field arithmetic on [NUM_WORDS, B] uint32 arrays.

These are trace-time functions composed inside Pallas TPU kernels: the limb
axis (20 for the 253-bit field) lives on sublanes, the batch axis B on the
128-wide lane axis, so every limb-level operation is a full-width VPU op over
the batch.  Limb loops are unrolled at trace time (static), matching the
carry-free interleaved Montgomery product design the reference chose for
w=13 / nsafe=32 (reference: src/submission/implementation/wgsl/montgomery/
mont_pro_product.template.wgsl:15-57 and README.md:374-396) — but vectorized
batch-first instead of thread-per-element.

Values are kept strictly normalized in [0, p) with limbs < 2^w after every
public op.  Constant field elements (p, d*R, R, R^2) cannot be materialized
inside Mosaic kernels, so kernels take a small `consts` input (see
`make_consts` / `Consts`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.params import PARAMS

L = PARAMS.num_words          # 20
W = PARAMS.word_size          # 13
MASK = np.uint32(PARAMS.mask)
N0 = np.uint32(PARAMS.n0)
U32 = jnp.uint32

#: Packed representation: 2 limbs per u32 -> 10 u32 per field element.
LP = (L + 1) // 2


def int_to_limbs(v: int) -> np.ndarray:
    return np.array([(v >> (i * W)) & PARAMS.mask for i in range(L)], dtype=np.uint32)


#: Column indices of each constant inside the consts input array [L, 8].
CONST_P, CONST_D, CONST_R, CONST_R2 = 0, 1, 2, 3


def make_consts_array() -> np.ndarray:
    """The [L, 8] uint32 constants array passed to every kernel: columns are
    (p, d*R mod p, R mod p, R^2 mod p, 0...)."""
    out = np.zeros((L, 8), dtype=np.uint32)
    out[:, CONST_P] = int_to_limbs(PARAMS.p)
    out[:, CONST_D] = int_to_limbs(PARAMS.edwards_d_mont)
    out[:, CONST_R] = int_to_limbs(PARAMS.r)
    out[:, CONST_R2] = int_to_limbs(PARAMS.r2)
    return out


class Consts(NamedTuple):
    """Constant field elements as [L, 1] in-kernel arrays."""

    p: jnp.ndarray
    d: jnp.ndarray
    r: jnp.ndarray
    r2: jnp.ndarray


def load_consts(consts_ref) -> Consts:
    c = consts_ref[:]
    return Consts(
        p=c[:, CONST_P:CONST_P + 1],
        d=c[:, CONST_D:CONST_D + 1],
        r=c[:, CONST_R:CONST_R + 1],
        r2=c[:, CONST_R2:CONST_R2 + 1],
    )


# ---------------------------------------------------------------------------
# Pack / unpack: 2 w-bit limbs per u32 word (lo in bits 0..15, hi in 16..31).


def pack2(a: jnp.ndarray) -> jnp.ndarray:
    """[L, B] limbs -> [LP, B] packed u32.  Row-wise concatenation (no strided
    slicing — Mosaic lowers strided sublane access to unsupported gathers)."""
    rows = []
    for i in range(LP):
        lo = a[2 * i:2 * i + 1]
        if 2 * i + 1 < L:
            rows.append(lo | (a[2 * i + 1:2 * i + 2] << 16))
        else:
            rows.append(lo)
    return jnp.concatenate(rows, axis=0)


def unpack2(pk: jnp.ndarray) -> jnp.ndarray:
    """[LP, B] packed -> [L, B] limbs (row-wise, gather-free)."""
    rows = []
    for i in range(LP):
        r = pk[i:i + 1]
        rows.append(r & U32(0xFFFF))
        if 2 * i + 1 < L:
            rows.append(r >> 16)
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# Normalization helpers.


def carry_sweep(s: jnp.ndarray) -> jnp.ndarray:
    """Propagate carries so every limb < 2^w.  Limbs may hold up to 32-bit
    values (reference analogue: mont_pro_product.template.wgsl:36-41)."""
    out = []
    c = jnp.zeros_like(s[0:1])
    for i in range(L):
        v = s[i:i + 1] + c
        out.append(v & MASK)
        c = v >> W
    return jnp.concatenate(out, axis=0)


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b over normalized limbs; returns [1, B] bool."""
    ge = jnp.ones_like(a[0:1], dtype=jnp.bool_)
    for i in range(L):
        ge = (a[i:i + 1] > b[i:i + 1]) | ((a[i:i + 1] == b[i:i + 1]) & ge)
    return ge


def sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) limbwise with borrow propagation; returns (diff, borrow[1,B])."""
    borrow = jnp.zeros_like(a[0:1])
    two_w = U32(1 << W)
    out = []
    for i in range(L):
        d = a[i:i + 1] + two_w - b[i:i + 1] - borrow
        borrow = U32(1) - (d >> W)
        out.append(d & MASK)
    return jnp.concatenate(out, axis=0), borrow


def cond_sub_p(a: jnp.ndarray, pv: jnp.ndarray) -> jnp.ndarray:
    """If a >= p subtract p (a < 2p assumed)."""
    pb = jnp.broadcast_to(pv, a.shape)
    diff, _ = sub_limbs(a, pb)
    return jnp.where(geq(a, pb), diff, a)


# ---------------------------------------------------------------------------
# Field ops (strict: inputs/outputs in [0, p), normalized limbs).


def fr_add(a: jnp.ndarray, b: jnp.ndarray, pv: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p (reference analogue: wgsl/field/field.template.wgsl fr_add)."""
    return cond_sub_p(carry_sweep(a + b), pv)


def fr_sub(a: jnp.ndarray, b: jnp.ndarray, pv: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p (reference analogue: fr_sub: on borrow add p)."""
    diff, borrow = sub_limbs(a, b)
    plus_p = carry_sweep(diff + jnp.broadcast_to(pv, a.shape))
    return jnp.where(borrow != 0, plus_p, diff)


def fr_neg(a: jnp.ndarray, pv: jnp.ndarray) -> jnp.ndarray:
    """p - a; maps 0 -> p (≡ 0 mod p, still a valid < 2p Montgomery input and
    normalized limb-wise, so downstream ops are unaffected)."""
    pb = jnp.broadcast_to(pv, a.shape)
    diff, _ = sub_limbs(pb, a)
    return diff


def mont_mul(x: jnp.ndarray, y: jnp.ndarray, pv: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product x*y*R^-1 mod p, carry-free interleaved form.

    TPU re-design of the reference's production Montgomery kernel
    (reference: mont_pro_product.template.wgsl:15-57): with w=13, L=20 and
    nsafe=32 >= L, the accumulator absorbs 2 products of < 2^26 per iteration
    for all 20 iterations without intra-loop carries; one carry sweep and one
    conditional subtract run at the end.  ~2*L^2 = 800 lane-multiplies.
    """
    s = jnp.zeros_like(x)
    zrow = jnp.zeros_like(x[0:1])
    pb = jnp.broadcast_to(pv, x.shape)
    for i in range(L):
        xi = x[i:i + 1]
        t = s[0:1] + xi * y[0:1]
        qi = (N0 * (t & MASK)) & MASK
        u = s + xi * y + qi * pb
        c = u[0:1] >> W
        s = jnp.concatenate([u[1:2] + c, u[2:], zrow], axis=0)
    return cond_sub_p(carry_sweep(s), pv)
