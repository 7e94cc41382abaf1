"""In-kernel extended twisted Edwards point arithmetic and batched point-add
Pallas kernels.

Points inside kernels are 4-tuples of [L, B] uint32 limb arrays (X, Y, T, Z),
all in Montgomery form.  Formulas are unified add-2008-hwcd / dbl-2008-hwcd
with a = -1 folded in (reference analogue:
src/submission/implementation/wgsl/curve/ec.template.wgsl:7-66), re-shaped for
batch-first VPU execution.

Two add variants:
- `madd` (8 Montgomery products): second operand is an affine table point with
  Z = R (Montgomery 1) and the precomputed product d*T available — the hot op
  of the bucket-accumulation scan.
- `full_add` (10 products): both operands arbitrary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    L,
    LP,
    Consts,
    carry_sweep,
    cond_sub_p,
    fr_add,
    fr_neg,
    fr_sub,
    load_consts,
    make_consts_array,
    mont_mul,
    pack2,
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


def madd(p1: Pt, x2, y2, td2, c: Consts) -> Pt:
    """Mixed add: p1 + (x2, y2) where the table point is affine (Z2 = R) and
    td2 = d*T2 is precomputed.  8 Montgomery products.

    add-2008-hwcd with a = -1: H = B - aA = B + A
    (reference analogue: ec.template.wgsl:34-66, one product saved by the
    precomputed d*t and one by Z2 = R ⇒ D = Z1)."""
    pv = c.p
    a = mont_mul(p1.x, x2, pv)
    b = mont_mul(p1.y, y2, pv)
    cc = mont_mul(p1.t, td2, pv)
    d = p1.z
    e = fr_sub(
        mont_mul(fr_add(p1.x, p1.y, pv), fr_add(x2, y2, pv), pv),
        fr_add(a, b, pv),
        pv,
    )
    f = fr_sub(d, cc, pv)
    g = fr_add(d, cc, pv)
    h = fr_add(b, a, pv)
    return Pt(mont_mul(e, f, pv), mont_mul(g, h, pv), mont_mul(e, h, pv), mont_mul(f, g, pv))


def full_add(p1: Pt, p2: Pt, c: Consts) -> Pt:
    """General unified add, 10 Montgomery products (both Z arbitrary)."""
    pv = c.p
    a = mont_mul(p1.x, p2.x, pv)
    b = mont_mul(p1.y, p2.y, pv)
    t12 = mont_mul(p1.t, p2.t, pv)
    cc = mont_mul(t12, jnp.broadcast_to(c.d, t12.shape), pv)
    d = mont_mul(p1.z, p2.z, pv)
    e = fr_sub(
        mont_mul(fr_add(p1.x, p1.y, pv), fr_add(p2.x, p2.y, pv), pv),
        fr_add(a, b, pv),
        pv,
    )
    f = fr_sub(d, cc, pv)
    g = fr_add(d, cc, pv)
    h = fr_add(b, a, pv)
    return Pt(mont_mul(e, f, pv), mont_mul(g, h, pv), mont_mul(e, h, pv), mont_mul(f, g, pv))


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
    lblk = 128
    while n % lblk != 0:
        lblk //= 2
    grid = (n // lblk,)
    consts = jnp.asarray(make_consts_array())
    mask2 = mask.astype(jnp.int32).reshape(1, n)
    interp = jax.default_backend() != "tpu" if interpret is None else interpret
    kern = lambda *refs: _masked_add_kernel(lblk, *refs)
    return pl.pallas_call(
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


def double(p1: Pt, c: Consts) -> Pt:
    """dbl-2008-hwcd with a = -1 (reference analogue: ec.template.wgsl:7-30)."""
    pv = c.p
    a = mont_mul(p1.x, p1.x, pv)
    b = mont_mul(p1.y, p1.y, pv)
    zz = mont_mul(p1.z, p1.z, pv)
    cc = fr_add(zz, zz, pv)
    d = fr_neg(a, pv)
    # fr_neg may return p for a == 0; normalize via fr_add with 0? Not needed:
    # downstream fr_add/fr_sub assume inputs < 2p only for mont; but g/h feed
    # fr_sub which assumes normalized limb values — p has normalized limbs.
    xy = fr_add(p1.x, p1.y, pv)
    e = fr_sub(mont_mul(xy, xy, pv), fr_add(a, b, pv), pv)
    g = fr_add(d, b, pv)
    f = fr_sub(g, cc, pv)
    h = fr_sub(d, b, pv)
    return Pt(mont_mul(e, f, pv), mont_mul(g, h, pv), mont_mul(e, h, pv), mont_mul(f, g, pv))
