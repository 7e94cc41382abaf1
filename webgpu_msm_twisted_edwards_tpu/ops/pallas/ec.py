"""In-kernel extended twisted Edwards point arithmetic and batched point-add
Pallas kernels.

Points inside kernels are 4-tuples of [L, B] uint32 limb arrays (X, Y, T, Z),
all in Montgomery form.  Formulas are unified add-2008-hwcd / dbl-2008-hwcd
with a = -1 folded in (reference analogue:
src/submission/implementation/wgsl/curve/ec.template.wgsl:7-66), re-shaped for
batch-first VPU execution.

Two add variants:
- `madd` (7 Montgomery products): second operand is an affine table point in
  cached form (y-x, y+x, 2d*t with Z = R) — the hot op of the
  bucket-accumulation scan.
- `full_add` (9 products): both operands arbitrary.

Both use the "rotated" a = -1 form (A = (Y1-X1)(Y2-X2), B = (Y1+X1)(Y2+X2),
the layout ed25519 reference code popularised): every intermediate is exactly
2x the corresponding unified add-2008-hwcd value, so the output is the same
point scaled projectively by 4 and the formula keeps hwcd's unified behaviour
(doubling-safe) while saving one product per add.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import (
    L,
    LP,
    Consts,
    interpret_default,
    add_many,
    fr_add_lazy,
    fr_neg_lazy,
    fr_sub_lazy,
    load_consts,
    make_consts_array,
    mont_many,
    mont_mul,
    pack2,
    sub_many,
    unpack2,
)


class Pt(NamedTuple):
    """Extended point as [L, B] limb arrays (Montgomery form)."""

    x: jnp.ndarray
    y: jnp.ndarray
    t: jnp.ndarray
    z: jnp.ndarray


def pt_identity(shape, c: Consts) -> Pt:
    """(0 : R : 0 : R) — Montgomery form of (0 : 1 : 0 : 1)."""
    r = jnp.broadcast_to(c.r, shape)
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    return Pt(zero, r, zero, r)


def pt_select(mask, a: Pt, b: Pt) -> Pt:
    """mask is [1, B] bool: True -> a."""
    return Pt(*(jnp.where(mask, ai, bi) for ai, bi in zip(a, b)))


def pt_pack(p: Pt) -> jnp.ndarray:
    """Pt -> [4*LP, B] packed rows (x, y, t, z)."""
    return jnp.concatenate([pack2(p.x), pack2(p.y), pack2(p.t), pack2(p.z)], axis=0)


def pt_unpack(rows: jnp.ndarray) -> Pt:
    """[>=4*LP, B] packed rows -> Pt."""
    return Pt(
        unpack2(rows[0 * LP:1 * LP]),
        unpack2(rows[1 * LP:2 * LP]),
        unpack2(rows[2 * LP:3 * LP]),
        unpack2(rows[3 * LP:4 * LP]),
    )


def madd(p1: Pt, d2, s2, td2, c: Consts) -> Pt:
    """Mixed add: p1 + table point given in cached form d2 = y2-x2,
    s2 = y2+x2, td2 = 2*d*t2 (affine, Z2 = R).  7 Montgomery products.

    Rotated a = -1 hwcd (ed25519 ge_madd layout): A = (Y1-X1)*d2,
    B = (Y1+X1)*s2, C = T1*td2, D = 2*Z1, E = B-A, F = D-C, G = D+C,
    H = B+A; (X3,Y3,T3,Z3) = (EF, GH, EH, FG).  Every intermediate is 2x the
    unified add-2008-hwcd value (reference analogue: ec.template.wgsl:34-66),
    so the result is the same point scaled by 4 — unified behaviour kept, one
    product saved vs the plain (x, y, d*t) table."""
    # Lazy-reduction bounds (all values mod-p-equivalent, < 9.2p < 2^256):
    # accumulator coords < 1.3p (mont outputs); table rows < 5p
    # (ops/pallas/convert.py); D1 = Y1-X1+4p < 5.3p; mont outputs
    # < p + uv/R <= p + (5.3p*6.6p)/R < 1.3p (R = 2^260 = 128p·…);
    # sums < 3.8p; differences < minuend + 4p < 6.6p — all mont inputs < 9p
    # with fr_sub_lazy subtrahends < 3p.  Montgomery products run batched
    # (mont_many) — the formula's natural independence hides the per-limb
    # sequential chains (see common.py).
    pv = c.p
    d1 = fr_sub_lazy(p1.y, p1.x, c)
    s1, dd = add_many([(p1.x, p1.y), (p1.z, p1.z)])
    a, b, cc = mont_many([(d1, d2), (s1, s2), (p1.t, td2)], pv)
    e, f = sub_many([(b, a), (dd, cc)], c)
    g, h = add_many([(dd, cc), (b, a)])
    x3, y3, t3, z3 = mont_many([(e, f), (g, h), (e, h), (f, g)], pv)
    return Pt(x3, y3, t3, z3)


def full_add(p1: Pt, p2: Pt, c: Consts) -> Pt:
    """General unified add, 9 Montgomery products (both Z arbitrary).

    Same rotated a = -1 form as :func:`madd` with C = d*T1*T2 doubled by a
    lazy add (no 2d constant) and D = 2*Z1*Z2."""
    pv = c.p
    d1, d2 = sub_many([(p1.y, p1.x), (p2.y, p2.x)], c)
    s1, s2 = add_many([(p1.x, p1.y), (p2.x, p2.y)])
    a, b, t12, z12 = mont_many([(d1, d2), (s1, s2), (p1.t, p2.t), (p1.z, p2.z)], pv)
    cc1 = mont_mul(t12, jnp.broadcast_to(c.d, t12.shape), pv, reduce=False)
    cc, dd = add_many([(cc1, cc1), (z12, z12)])
    e, f = sub_many([(b, a), (dd, cc)], c)
    g, h = add_many([(dd, cc), (b, a)])
    x3, y3, t3, z3 = mont_many([(e, f), (g, h), (e, h), (f, g)], pv)
    return Pt(x3, y3, t3, z3)


def _masked_add_kernel(lblk, consts_ref, a_ref, b_ref, m_ref, o_ref):
    """o = mask ? a + b : a, rows packed [lblk, TW]."""
    c = load_consts(consts_ref)
    pa = pt_unpack(jnp.transpose(a_ref[:]))
    pb = pt_unpack(jnp.transpose(b_ref[:]))
    mask = m_ref[0:1, :] != 0
    s = full_add(pa, pb, c)
    out = pt_select(mask, s, pa)
    pad = jnp.zeros((a_ref.shape[-1] - 4 * LP, lblk), jnp.uint32)
    o_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(out), pad], axis=0))


def masked_add_rows(a_rows: jnp.ndarray, b_rows: jnp.ndarray, mask: jnp.ndarray,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Batched conditional point add over packed coordinate rows.

    a_rows, b_rows: [N, TW] packed (x,y,t,z) points; mask: [N] int32/bool.
    Returns [N, TW] with row i = mask_i ? a_i + b_i : a_i.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tw = a_rows.shape
    orig_n = n
    if n % 128 != 0:
        # Mosaic requires lane-dim blocks of 128 (the mask rides the lane
        # axis); pad with mask=0 rows (passed through unchanged) and slice.
        pad = 128 - n % 128
        a_rows = jnp.concatenate([a_rows, jnp.zeros((pad, tw), a_rows.dtype)])
        b_rows = jnp.concatenate([b_rows, jnp.zeros((pad, tw), b_rows.dtype)])
        mask = jnp.concatenate([mask.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)])
        n += pad
    lblk = 128
    grid = (n // lblk,)
    consts = jnp.asarray(make_consts_array())
    mask2 = mask.astype(jnp.int32).reshape(1, n)
    interp = interpret_default(interpret)
    kern = lambda *refs: _masked_add_kernel(lblk, *refs)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tw), jnp.uint32),
        interpret=interp,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, a_rows, b_rows, mask2)
    return out[:orig_n]


def _extract_reconstruct_kernel(lblk, twr, consts_ref, b_ref, r_ref, m_ref,
                                c_ref, o_ref):
    """Quarter-store extraction (see ops/pallas/scan.py::msm_scan_rm_sames_q):
    per row, re-derive the inclusive scan value at an unstored step with up to
    two madd steps (identical recurrence to the scan kernel — select the
    restart, madd the table row), then apply the cross-fragment carry.

    b_ref: [lblk, TW] packed base values (the nearest stored scan value at or
    before the target step; garbage when the first re-madd restarts).
    r_ref: [lblk, 2*twr] the scan-input rows at steps 4q and 4q+1 (row-major
    cached y-x, y+x, 2*d*t at cols 0..3L-1 of each twr half).
    m_ref: [1, lblk] int32 bits: 1 apply step 4q, 2 apply step 4q+1,
    4 same-segment at 4q, 8 same-segment at 4q+1, 16 carry mask.
    c_ref: [lblk, TW] packed carry rows.  o_ref: [lblk, TW]."""
    c = load_consts(consts_ref)
    bits = m_ref[0:1, :]
    v = pt_unpack(jnp.transpose(b_ref[:]))
    ident = pt_identity(v.x.shape, c)
    slab = jnp.transpose(r_ref[:])                        # [2*twr, lblk]

    def apply_step(v, base, mbit, sbit):
        d2 = slab[base + 0 * L:base + 1 * L]
        s2 = slab[base + 1 * L:base + 2 * L]
        td2 = slab[base + 2 * L:base + 3 * L]
        stepped = madd(pt_select((bits & sbit) != 0, v, ident), d2, s2, td2, c)
        return pt_select((bits & mbit) != 0, stepped, v)

    v = apply_step(v, 0, 1, 4)
    v = apply_step(v, twr, 2, 8)
    carry = pt_unpack(jnp.transpose(c_ref[:]))
    out = pt_select((bits & 16) != 0, full_add(v, carry, c), v)
    pad = jnp.zeros((b_ref.shape[-1] - 4 * LP, lblk), jnp.uint32)
    o_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(out), pad], axis=0))


def extract_reconstruct_rows(base_rows: jnp.ndarray, pair_rows: jnp.ndarray,
                             bits: jnp.ndarray, carry_rows: jnp.ndarray,
                             interpret: bool | None = None) -> jnp.ndarray:
    """Fused quarter-store extraction: base_rows [N, TW] packed scan values,
    pair_rows [N, 2*TWR] scan-input rows for steps (4q, 4q+1), bits [N] int32
    (see kernel), carry_rows [N, TW].  Returns [N, TW] bucket values —
    bit-identical to the full-store pipeline's masked_add_rows(tval, cval,
    mask) on the same buckets (the reconstruction replays the scan kernel's
    own recurrence on the same packed representatives)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tw = base_rows.shape
    twr2 = pair_rows.shape[1]
    orig_n = n
    if n % 128 != 0:
        pad = 128 - n % 128
        base_rows = jnp.concatenate([base_rows, jnp.zeros((pad, tw), base_rows.dtype)])
        pair_rows = jnp.concatenate([pair_rows, jnp.zeros((pad, twr2), pair_rows.dtype)])
        carry_rows = jnp.concatenate([carry_rows, jnp.zeros((pad, tw), carry_rows.dtype)])
        bits = jnp.concatenate([bits.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)])
        n += pad
    lblk = 128
    consts = jnp.asarray(make_consts_array())
    bits2 = bits.astype(jnp.int32).reshape(1, n)
    kern = lambda *refs: _extract_reconstruct_kernel(lblk, twr2 // 2, *refs)
    out = pl.pallas_call(
        kern,
        grid=(n // lblk,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, twr2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tw), jnp.uint32),
        interpret=interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, base_rows, pair_rows, bits2, carry_rows)
    return out[:orig_n]


def double(p1: Pt, c: Consts) -> Pt:
    """dbl-2008-hwcd with a = -1 (reference analogue: ec.template.wgsl:7-30)."""
    pv = c.p
    xy = fr_add_lazy(p1.x, p1.y)
    a, b, zz, e_in = mont_many([(p1.x, p1.x), (p1.y, p1.y), (p1.z, p1.z), (xy, xy)], pv)
    cc, s_ab = add_many([(zz, zz), (a, b)])
    d = fr_neg_lazy(a, c)
    e, h = sub_many([(e_in, s_ab), (d, b)], c)
    g = fr_add_lazy(d, b)
    f = fr_sub_lazy(g, cc, c)
    x3, y3, t3, z3 = mont_many([(e, f), (g, h), (e, h), (f, g)], pv)
    return Pt(x3, y3, t3, z3)


def _double_rows_kernel(lblk, times, consts_ref, in_ref, o_ref):
    """o = 2^times * p, rows packed [lblk, TW]."""
    c = load_consts(consts_ref)
    p = pt_unpack(jnp.transpose(in_ref[:]))
    p = jax.lax.fori_loop(0, times, lambda i, q: double(q, c), p)
    pad = jnp.zeros((in_ref.shape[-1] - 4 * LP, lblk), jnp.uint32)
    o_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(p), pad], axis=0))


def double_rows(rows: jnp.ndarray, times: int,
                interpret: bool | None = None) -> jnp.ndarray:
    """times successive extended-Edwards doublings over packed coordinate
    rows: [N, TW] packed (x,y,t,z) Montgomery points -> [N, TW].

    The fixed-base precompute's window chain (ops/precompute.py) runs
    c doublings per window over the whole point set — ~2 G Montgomery
    multiplies at 2^20, which the batched Pallas path sustains at ~950 M/s
    vs the XLA-mirror curve ops' far lower rate.  dbl-2008-hwcd, 8 products
    per doubling (reference analogue: ec.template.wgsl:7-30)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, tw = rows.shape
    orig_n = n
    if n % 128 != 0:
        pad = 128 - n % 128
        rows = jnp.concatenate([rows, jnp.zeros((pad, tw), rows.dtype)])
        n += pad
    lblk = 128
    consts = jnp.asarray(make_consts_array())
    kern = lambda *refs: _double_rows_kernel(lblk, times, *refs)
    out = pl.pallas_call(
        kern,
        grid=(n // lblk,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tw), jnp.uint32),
        interpret=interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, rows)
    return out[:orig_n]
