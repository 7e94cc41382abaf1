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


def interpret_default(interpret):
    """Kernel-mode default: compiled on TPU, interpreter elsewhere."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def int_to_limbs(v: int) -> np.ndarray:
    return np.array([(v >> (i * W)) & PARAMS.mask for i in range(L)], dtype=np.uint32)


#: Column indices of each constant inside the consts input array [L, 8].
CONST_P, CONST_D, CONST_R, CONST_R2, CONST_Q4 = 0, 1, 2, 3, 4


def _q4_limbs() -> np.ndarray:
    """4p in 'headroom' limb form: same value, but every limb except the top
    is >= 2^w, so q4 - b never borrows limb-wise for normalized b.  Used by
    the lazy subtraction a - b ≡ a + (4p - b)  (valid for b < 3p; the top
    limb is checked against that bound)."""
    v = 4 * PARAMS.p
    q = [(v >> (i * W)) & PARAMS.mask for i in range(L)]
    for i in range(L - 1):
        q[i] += 1 << W
        q[i + 1] -= 1
    assert all(qi >= PARAMS.mask for qi in q[:-1])
    # Max top limb of a subtrahend b < 3p:
    b19_max = (3 * PARAMS.p) >> ((L - 1) * W)
    assert q[-1] >= b19_max + 1, (q[-1], b19_max)
    assert sum(qi << (i * W) for i, qi in enumerate(q)) == v
    return np.array(q, dtype=np.uint32)


def make_consts_array() -> np.ndarray:
    """The [L, 8] uint32 constants array passed to every kernel: columns are
    (p, d*R mod p, R mod p, R^2 mod p, q4 headroom form of 4p, 0...)."""
    out = np.zeros((L, 8), dtype=np.uint32)
    out[:, CONST_P] = int_to_limbs(PARAMS.p)
    out[:, CONST_D] = int_to_limbs(PARAMS.edwards_d_mont)
    out[:, CONST_R] = int_to_limbs(PARAMS.r)
    out[:, CONST_R2] = int_to_limbs(PARAMS.r2)
    out[:, CONST_Q4] = _q4_limbs()
    return out


class Consts(NamedTuple):
    """Constant field elements as [L, 1] in-kernel arrays."""

    p: jnp.ndarray
    d: jnp.ndarray
    r: jnp.ndarray
    r2: jnp.ndarray
    q4: jnp.ndarray


def load_consts(consts_ref) -> Consts:
    c = consts_ref[:]
    return Consts(
        p=c[:, CONST_P:CONST_P + 1],
        d=c[:, CONST_D:CONST_D + 1],
        r=c[:, CONST_R:CONST_R + 1],
        r2=c[:, CONST_R2:CONST_R2 + 1],
        q4=c[:, CONST_Q4:CONST_Q4 + 1],
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


# ---------------------------------------------------------------------------
# Batched ("many") variants: the VPU stalls on the sequential per-limb scalar
# chains (the Montgomery qi recurrence, carry sweeps) when processing a single
# field element — raw u32 MLA throughput is ~2 T/s but a lone interleaved
# product reaches only ~0.3 T/s.  Stacking G independent operations into
# [G, L, B] arrays amortizes every sequential step G-fold: measured ~2.4x
# (950 M vs 395 M mont/s) at G=4, which is exactly the independence the
# EC add/double formulas offer.


def _stack(arrs):
    return jnp.stack(arrs, axis=0)


def mont_many(pairs, pv) -> list:
    """Batched lazy Montgomery products: [(x, y), ...] -> [x*y*R^-1 ...].
    All inputs [L, B] with normalized limbs, values < ~9p."""
    g = len(pairs)
    if g == 1:
        return [mont_mul(pairs[0][0], pairs[0][1], pv, reduce=False)]
    x = _stack([p[0] for p in pairs])
    y = _stack([p[1] for p in pairs])
    s = jnp.zeros_like(x)
    ztail = jnp.zeros_like(x[:, 0:1])
    pb = pv[None, :, :]
    for i in range(L):
        xi = x[:, i:i + 1]
        t = s[:, 0:1] + xi * y[:, 0:1]
        qi = (N0 * (t & MASK)) & MASK
        u = s + xi * y + qi * pb
        c = u[:, 0:1] >> W
        s = jnp.concatenate([u[:, 1:2] + c, u[:, 2:], ztail], axis=1)
    out = []
    c = jnp.zeros_like(s[:, 0:1])
    for i in range(L):
        v = s[:, i:i + 1] + c
        out.append(v & MASK)
        c = v >> W
    r = jnp.concatenate(out, axis=1)
    return [r[i] for i in range(g)]


def sweep_many(raws: list) -> list:
    """Batched carry sweep over a list of [L, B] raw column sums."""
    g = len(raws)
    if g == 1:
        return [carry_sweep(raws[0])]
    s = _stack(raws)
    out = []
    c = jnp.zeros_like(s[:, 0:1])
    for i in range(L):
        v = s[:, i:i + 1] + c
        out.append(v & MASK)
        c = v >> W
    r = jnp.concatenate(out, axis=1)
    return [r[i] for i in range(g)]


def add_many(pairs) -> list:
    """Batched lazy additions (carry-normalize only)."""
    return sweep_many([a + b for a, b in pairs])


def sub_many(pairs, c: "Consts") -> list:
    """Batched lazy subtractions a - b + 4p (b < 3p)."""
    return sweep_many([a + (jnp.broadcast_to(c.q4, a.shape) - b) for a, b in pairs])


def fr_add_lazy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b with carry normalization only (no mod-p reduction).  Values may
    exceed p; all lazy-path values stay < ~9p < 2^256, far inside the 20x13 =
    260-bit limb capacity (see the bounds analysis in ec.py)."""
    return carry_sweep(a + b)


def fr_sub_lazy(a: jnp.ndarray, b: jnp.ndarray, c: "Consts") -> jnp.ndarray:
    """a - b + 4p, borrow-free: requires b < 3p (q4's headroom guarantees
    q4_i >= b_i limb-wise under that bound)."""
    q4 = jnp.broadcast_to(c.q4, a.shape)
    return carry_sweep(a + (q4 - b))


def fr_neg_lazy(b: jnp.ndarray, c: "Consts") -> jnp.ndarray:
    """4p - b (≡ -b mod p), borrow-free for b < 3p."""
    q4 = jnp.broadcast_to(c.q4, b.shape)
    return carry_sweep(q4 - b)


def mont_mul(x: jnp.ndarray, y: jnp.ndarray, pv: jnp.ndarray, reduce: bool = True) -> jnp.ndarray:
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
    s = carry_sweep(s)
    if not reduce:
        # Lazy form: output < p + x*y/R — strictly below ~1.3p for all inputs
        # the EC formulas produce (see ec.py bounds); mod-p only at the end.
        return s
    return cond_sub_p(s, pv)
