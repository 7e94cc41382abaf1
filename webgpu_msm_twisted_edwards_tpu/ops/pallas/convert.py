"""Point conversion kernel: affine u32 words -> packed Montgomery table rows.

TPU re-design of the reference's convert stage (reference:
src/submission/implementation/wgsl/cuzk/convert_point_coords_and_decompose_
scalars.template.wgsl:39-77): per point, re-limb the 8-word coordinates into
w-bit limbs, enter Montgomery form, and precompute the cached table form
(y-x, y+x, 2*d*x*y) consumed by the 7-product mixed add (ops/pallas/ec.py).
The reference enters Montgomery form with a Barrett multiplication by R; here
it is mont_mul with R^2 (identical result, no second reduction path needed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .common import L, MASK, W, load_consts, make_consts_array, mont_many, mont_mul
from .scan import TWR as TW, _interpret_default

#: Points per kernel block.
CBLK = 256


def _limbs_from_words(words, num_rows: int):
    """words: [8, B] u32 LE rows -> [L, B] w-bit limb rows (static shifts)."""
    rows = []
    for i in range(L):
        b = i * W
        idx = b // 32
        off = b % 32
        v = words[idx:idx + 1] >> np.uint32(off)
        if off + W > 32 and idx + 1 < num_rows:
            v = v | (words[idx + 1:idx + 2] << np.uint32(32 - off))
        rows.append(v & MASK)
    return jnp.concatenate(rows, axis=0)


def _convert_kernel(lblk, consts_ref, words_ref, out_ref, neg_ref):
    """words_ref: [lblk, 16] (x words 0..7, y words 8..15); out_ref
    [lblk, TW] with the CACHED point form y-x, y+x, 2*d*t as raw limbs at
    columns 0..59 — the 7-product madd's table layout (the scan starts
    segments from the identity, so neither plain x/y nor t is stored);
    neg_ref: the negated rows for the signed-bucket table half (reference
    analogue: smvp.template.wgsl:47-56) — negating (x, y) -> (-x, y) just
    SWAPS y-x and y+x and negates 2*d*t, so the negative half costs one
    subtraction instead of two.

    Bounds: xm/ym/tdm are reduced mont products (< 1.3p); dm = y-x+4p < 5.3p,
    sm/td2 < 2.6p, ntd2 = 4p-td2 < 4p — all table rows < 5.3p with
    normalized limbs, within madd's documented input budget."""
    from .common import carry_sweep, fr_add_lazy, fr_sub_lazy

    c = load_consts(consts_ref)
    wds = jnp.transpose(words_ref[:])              # [16, lblk]
    x = _limbs_from_words(wds[0:8], 8)
    y = _limbs_from_words(wds[8:16], 8)
    r2 = jnp.broadcast_to(c.r2, x.shape)
    # x*R and y*R are independent — batch them (the single-product rate is
    # the sequential qi-chain bound, ~350 M/s vs ~660 M/s for a 2-batch).
    xm, ym = mont_many([(x, r2), (y, r2)], c.p)
    tm = mont_mul(xm, ym, c.p)
    tdm = mont_mul(tm, jnp.broadcast_to(c.d, x.shape), c.p)
    dm = fr_sub_lazy(ym, xm, c)                    # y - x (+4p)
    sm = fr_add_lazy(xm, ym)                       # y + x
    td2 = fr_add_lazy(tdm, tdm)                    # 2*d*t
    pad = jnp.zeros((TW - 3 * L, lblk), jnp.uint32)
    out_ref[:, :] = jnp.transpose(jnp.concatenate([dm, sm, td2, pad], axis=0))
    q4 = jnp.broadcast_to(c.q4, xm.shape)
    ntd2 = carry_sweep(q4 - td2)
    neg_ref[:, :] = jnp.transpose(jnp.concatenate([sm, dm, ntd2, pad], axis=0))


def build_table_pair(coords_u32: jnp.ndarray, interpret: bool | None = None):
    """[n, 2, 8] affine coordinate words -> (rows, neg_rows), each [n, TW]
    Montgomery table rows in cached form (y-x, y+x, 2*d*t unpacked limbs;
    neg_rows hold the point negations for the signed-bucket table half)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = coords_u32.shape[0]
    words = coords_u32.reshape(n, 16)
    lblk = CBLK
    while n % lblk != 0:
        lblk //= 2
    grid = (n // lblk,)
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        partial(_convert_kernel, lblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, TW), jnp.uint32),
            jax.ShapeDtypeStruct((n, TW), jnp.uint32),
        ],
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, words)


def build_table(coords_u32: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """[n, 2, 8] affine coordinate words -> [n, TW] Montgomery table rows
    in cached form (y-x, y+x, 2*d*t unpacked limbs)."""
    return build_table_pair(coords_u32, interpret=interpret)[0]


def _convert_kernel_full(lblk, consts_ref, words_ref, out_ref):
    """Same math as _convert_kernel but writes both halves of the doubled
    table into ONE [2, lblk, TW] block (dim 0: 0 = points, 1 = negations), so
    the caller's [2, n, TW] output reshapes to the [2n, TW] doubled table for
    free — retiring the 1 GB concatenate copy the two-output variant needed
    (XProf: 3.3 ms at 2^20, experiments/trace_probe.py)."""
    from .common import carry_sweep, fr_add_lazy, fr_sub_lazy

    c = load_consts(consts_ref)
    wds = jnp.transpose(words_ref[:])              # [16, lblk]
    x = _limbs_from_words(wds[0:8], 8)
    y = _limbs_from_words(wds[8:16], 8)
    r2 = jnp.broadcast_to(c.r2, x.shape)
    xm, ym = mont_many([(x, r2), (y, r2)], c.p)    # independent: 2-batch
    tm = mont_mul(xm, ym, c.p)
    tdm = mont_mul(tm, jnp.broadcast_to(c.d, x.shape), c.p)
    dm = fr_sub_lazy(ym, xm, c)                    # y - x (+4p)
    sm = fr_add_lazy(xm, ym)                       # y + x
    td2 = fr_add_lazy(tdm, tdm)                    # 2*d*t
    pad = jnp.zeros((TW - 3 * L, lblk), jnp.uint32)
    out_ref[0, :, :] = jnp.transpose(jnp.concatenate([dm, sm, td2, pad], axis=0))
    q4 = jnp.broadcast_to(c.q4, xm.shape)
    ntd2 = carry_sweep(q4 - td2)
    out_ref[1, :, :] = jnp.transpose(jnp.concatenate([sm, dm, ntd2, pad], axis=0))


def build_table_doubled(coords_u32: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    """[n, 2, 8] affine coordinate words -> [2n, TW] doubled table (rows
    0..n-1 the points, n..2n-1 their negations) written in place by the
    convert kernel — bit-identical to concatenating build_table_pair's
    outputs, without the concat copy."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = coords_u32.shape[0]
    words = coords_u32.reshape(n, 16)
    lblk = CBLK
    while n % lblk != 0:
        lblk //= 2
    grid = (n // lblk,)
    consts = jnp.asarray(make_consts_array())
    out = pl.pallas_call(
        partial(_convert_kernel_full, lblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, lblk, TW), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n, TW), jnp.uint32),
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, words)
    return out.reshape(2 * n, TW)
