"""Bucket accumulation as a chunked segmented scan — the production SMVP.

The reference accumulates buckets with one GPU thread per bucket gathering its
points (reference: src/submission/implementation/wgsl/cuzk/smvp.template.wgsl:
60-149, fed by the atomics-based CSR transpose in transpose.wgsl:34-74).  On
TPU both stages are re-designed as:

    sort entries by bucket  ->  fragment the sorted order into runs of K
    ->  one VPU lane per fragment scans its K entries sequentially
    ->  a tiny hierarchical carry scan stitches buckets spanning fragments.

Total EC-add work is exactly `num_windows * n` mixed adds (the information-
theoretic minimum for bucket accumulation), independent of the bucket-size
distribution — unlike thread-per-bucket schemes, load imbalance costs nothing.

Memory layout: each scan step reads one [LBLK, 4*LP] tile of gathered table
rows and transposes it in-VMEM to the [limb, lane] compute layout; the
transposes ride the permute unit and are free next to the 8-product EC add.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .common import L, LP, load_consts, make_consts_array, sweep_many, unpack2
from .ec import Pt, full_add, madd, pt_identity, pt_pack, pt_select, pt_unpack

#: Entries per fragment (scan depth) and fragment-lanes per kernel block.
K = 64
LBLK = 256

#: Accumulator/output row width in u32 (packed x,y,t,z + padding).
TW = 64
#: Table row width in u32 (x,y,t,td unpacked at cols 0..79 — gathers are
#: row-count-bound, so the wider rows are free and save the in-kernel limb
#: interleave; padded to a full (8,128) tile).
TWR = 128


from .common import interpret_default as _interpret_default  # noqa: E402


# ---------------------------------------------------------------------------
# Main scan kernel.


def _msm_scan_kernel(lblk, consts_ref, rows_ref, keys_ref, sgn_ref, out_ref):
    """rows_ref: [lblk, K, TWR] gathered table rows (x,y,t,td packed-2);
    keys_ref/sgn_ref: [K, lblk] bucket keys / negation flags;
    out_ref: [lblk, K, TW] inclusive in-fragment scan values (x,y,t,z packed).
    """
    c = load_consts(consts_ref)
    zero = jnp.zeros((L, lblk), jnp.uint32)
    acc0 = Pt(zero, jnp.broadcast_to(c.r, (L, lblk)), zero, jnp.broadcast_to(c.r, (L, lblk)))
    key0 = jnp.full((1, lblk), -1, jnp.int32)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def body(j, state):
        acc, kprev = state
        slab = jnp.transpose(rows_ref[:, j, 0:4 * L])    # [4*L, LBLK]
        x2 = slab[0 * L:1 * L]
        y2 = slab[1 * L:2 * L]
        t2 = slab[2 * L:3 * L]
        td2 = slab[3 * L:4 * L]
        neg = sgn_ref[pl.ds(j, 1), :] != 0                    # [1, LBLK]
        q4 = jnp.broadcast_to(c.q4, x2.shape)
        nx2, nt2, ntd2 = sweep_many([q4 - x2, q4 - t2, q4 - td2])
        x2 = jnp.where(neg, nx2, x2)
        t2 = jnp.where(neg, nt2, t2)
        td2 = jnp.where(neg, ntd2, td2)

        kj = keys_ref[pl.ds(j, 1), :]                         # [1, lblk]
        same = kj == kprev
        added = madd(acc, x2, y2, td2, c)
        fresh = Pt(x2, y2, t2, jnp.broadcast_to(c.r, x2.shape))
        acc = pt_select(same, added, fresh)

        packed = jnp.concatenate([pt_pack(acc), pad], axis=0)   # [TW, LBLK]
        out_ref[:, j, :] = jnp.transpose(packed)
        return acc, kj

    jax.lax.fori_loop(0, K, body, (acc0, key0))


def msm_scan(rows: jnp.ndarray, keys_t: jnp.ndarray, sgn_t: jnp.ndarray,
             interpret: bool | None = None) -> jnp.ndarray:
    """rows: [NF, K, TWR]; keys_t, sgn_t: [K, NF].  Returns T: [NF, K, TW]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nf = rows.shape[0]
    lblk = LBLK
    while nf % lblk != 0:
        lblk //= 2
    grid = (nf // lblk,)
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        partial(_msm_scan_kernel, lblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, K, rows.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, K, TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K, TW), jnp.uint32),
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, rows, keys_t, sgn_t)


# ---------------------------------------------------------------------------
# Hierarchical carry scan: C_{f+1} = a_f * C_f + b_f  (exclusive, C_0 = id).


def _ab_scan_kernel(kab: int, lblk: int, consts_ref, a_ref, b_ref, c_ref, apre_ref,
                    aagg_ref, bagg_ref):
    """a_ref: [kab, lblk] int32; b_ref: [lblk, kab, TW] packed points.
    Outputs: c_ref [lblk, kab, TW] exclusive scan (carry-in = identity);
    apre_ref [kab, lblk] exclusive prefix-AND of a; aagg_ref [1, lblk];
    bagg_ref [lblk, TW]."""
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def body(j, state):
        acc, apre = state
        # Store exclusive values first.
        packed = jnp.concatenate([pt_pack(acc), pad], axis=0)
        c_ref[:, j, :] = jnp.transpose(packed)
        apre_ref[pl.ds(j, 1), :] = apre
        aj = a_ref[pl.ds(j, 1), :] != 0
        bj = pt_unpack(jnp.transpose(b_ref[:, j, :]))
        kept = pt_select(aj, acc, ident)
        acc = full_add(kept, bj, c)
        apre = jnp.where(aj, apre, jnp.zeros_like(apre))
        return acc, apre

    acc, apre = jax.lax.fori_loop(
        0, kab, body, (ident, jnp.ones((1, lblk), jnp.int32))
    )
    aagg_ref[:, :] = apre
    bagg_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(acc), pad], axis=0))


def ab_scan_level(a: jnp.ndarray, b: jnp.ndarray, kab: int,
                  interpret: bool | None = None):
    """One level: a [N] int32, b [N, TW] packed.  N must be divisible by kab.
    Returns (c_local [N, TW], apre [N], a_agg [N//kab], b_agg [N//kab, TW])."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[0]
    nc = n // kab
    assert nc * kab == n
    # Mosaic lane-dim rule: block lane size must be 128-divisible or equal to
    # the full dimension.  seg_carry_scan pads nc accordingly.
    lblk = nc if nc <= 128 else 128
    assert nc % lblk == 0, (nc, lblk)
    grid = (nc // lblk,)
    consts = jnp.asarray(make_consts_array())
    # Reshape to chunk-major layouts.
    a2 = a.reshape(nc, kab).T                      # [kab, nc]
    b3 = b.reshape(nc, kab, TW)

    kern = partial(_ab_scan_kernel, kab, lblk)
    c_loc, apre, a_agg, b_agg = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kab, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, kab, TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lblk, kab, TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kab, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, kab, TW), jnp.uint32),
            jax.ShapeDtypeStruct((kab, nc), jnp.int32),
            jax.ShapeDtypeStruct((1, nc), jnp.int32),
            jax.ShapeDtypeStruct((nc, TW), jnp.uint32),
        ],
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, a2, b3)
    return (
        c_loc.reshape(n, TW),
        apre.T.reshape(n),
        a_agg.reshape(nc),
        b_agg,
    )


def seg_carry_scan(a: jnp.ndarray, b: jnp.ndarray, kab: int = K,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Full exclusive linear scan C_{f+1} = a_f*C_f + b_f over [N] fragments.
    a: [N] int32 (0/1), b: [N, TW] packed points.  Returns C [N, TW]."""
    from .ec import masked_add_rows  # local import to avoid cycle

    n = a.shape[0]
    if n <= kab:
        c_loc, _, _, _ = ab_scan_level(a, b, n, interpret=interpret)
        return c_loc
    # Pad with reset steps (a=0, b=anything; carries for padding are never
    # read) so the chunk count is <= 128 or a multiple of 128 (Mosaic's
    # lane-dim block rule).
    nc = -(-n // kab)
    if nc > 128:
        nc = -(-nc // 128) * 128
    target = nc * kab
    if target != n:
        pad = target - n
        a = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
        b = jnp.concatenate([b, jnp.broadcast_to(b[-1:], (pad, b.shape[1]))])
        return seg_carry_scan(a, b, kab, interpret=interpret)[:n]
    c_loc, apre, a_agg, b_agg = ab_scan_level(a, b, kab, interpret=interpret)
    cin = seg_carry_scan(a_agg, b_agg, kab, interpret=interpret)   # [N//kab, TW]
    cin_rep = jnp.repeat(cin, kab, axis=0)                          # [N, TW]
    return masked_add_rows(c_loc, cin_rep, apre, interpret=interpret)
