"""Bucket-point reduction (BPR): per window, S = sum_b (b+1) * Bucket[b].

TPU re-design of the reference's two-stage running-sum shader (cuZK Alg. 4;
reference: src/submission/implementation/wgsl/cuzk/bpr.template.wgsl —
stage_1 running sums at :75-124, stage_2 double-and-add fix-up at :126-171):

- stage 1 (kernel): the bucket axis is cut into chunks of `CHUNK` buckets; one
  VPU lane per chunk scans its buckets in descending order maintaining the
  running sums m (chunk total) and g (locally weighted sum).
- stage 2 (kernel): g += m * (chunk_index * CHUNK) via SIMD double-and-add
  with the per-lane scalar derived from an in-kernel iota.
- the cross-chunk combination (sum of g over chunks per window) runs as a
  log-depth rolled reduction with the generic masked-add kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.params import PARAMS
from .common import L, LP, load_consts, make_consts_array
from .ec import (
    Pt,
    double,
    full_add,
    masked_add_rows,
    pt_identity,
    pt_pack,
    pt_select,
    pt_unpack,
)
from .scan import TW, _interpret_default

#: Buckets per chunk in stage 1.
CHUNK = 64


def _bpr_stage1_kernel(lblk, chunk, consts_ref, b_ref, m_ref, g_ref):
    """b_ref: [lblk, chunk, TW] bucket rows (ascending bucket order inside the
    chunk).  Scans descending: m += S_j; g += m.  Outputs packed m, g
    [lblk, TW]."""
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def body(i, state):
        m, g = state
        j = chunk - 1 - i
        s = pt_unpack(jnp.transpose(b_ref[:, j, :]))
        m = full_add(m, s, c)
        g = full_add(g, m, c)
        return m, g

    m, g = jax.lax.fori_loop(0, chunk, body, (ident, ident))
    m_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(m), pad], axis=0))
    g_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(g), pad], axis=0))


def bpr_stage1(buckets: jnp.ndarray, chunk: int = CHUNK, interpret: bool | None = None):
    """buckets: [W*NB, TW] packed rows, bucket-major per window.  Returns
    (m, g): each [W*NB/chunk, TW]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = buckets.shape[0]
    nc = n // chunk
    assert nc * chunk == n
    lblk = 128
    while nc % lblk != 0:
        lblk //= 2
    grid = (nc // lblk,)
    consts = jnp.asarray(make_consts_array())
    kern = partial(_bpr_stage1_kernel, lblk, chunk)
    m, g = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, chunk, TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, TW), jnp.uint32),
            jax.ShapeDtypeStruct((nc, TW), jnp.uint32),
        ],
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, buckets.reshape(nc, chunk, TW))
    return m, g


def _bpr_stage2_kernel(lblk, chunks_per_window, chunk, num_bits, consts_ref, m_ref, g_ref, o_ref):
    """g += m * (local_chunk_index * chunk), double-and-add MSB-first.
    m_ref/g_ref/o_ref: [lblk, TW]; lanes are chunk-major (window-major order,
    chunks_per_window per window)."""
    c = load_consts(consts_ref)
    m = pt_unpack(jnp.transpose(m_ref[:]))
    g = pt_unpack(jnp.transpose(g_ref[:]))
    ident = pt_identity((L, lblk), c)
    import jax.experimental.pallas as pl

    blk = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lblk), 1) + blk * lblk
    kfac = (lane % chunks_per_window) * chunk                     # [1, lblk]

    def body(i, acc):
        bit = num_bits - 1 - i
        acc = double(acc, c)
        take = ((kfac >> bit) & 1) != 0
        return pt_select(take, full_add(acc, m, c), acc)

    fix = jax.lax.fori_loop(0, num_bits, body, ident)
    out = full_add(g, fix, c)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)
    o_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(out), pad], axis=0))


def bpr_stage2(m: jnp.ndarray, g: jnp.ndarray, chunks_per_window: int,
               chunk: int = CHUNK, interpret: bool | None = None) -> jnp.ndarray:
    """Returns g' [NC, TW] with the chunk-offset fix applied."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc = m.shape[0]
    lblk = 128
    while nc % lblk != 0:
        lblk //= 2
    grid = (nc // lblk,)
    num_bits = max(1, int((chunks_per_window - 1) * chunk).bit_length())
    consts = jnp.asarray(make_consts_array())
    kern = partial(_bpr_stage2_kernel, lblk, chunks_per_window, chunk, num_bits)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, TW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, TW), jnp.uint32),
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, m, g)


def reduce_rows_per_window(rows: jnp.ndarray, per_window: int,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Log-depth EC reduction of [W*per_window, TW] packed rows to [W, TW]
    (window-major lanes).  per_window must be a power of two."""
    n = rows.shape[0]
    w = n // per_window
    assert per_window & (per_window - 1) == 0, per_window
    cur = per_window
    while cur > 1:
        half = cur // 2
        r3 = rows.reshape(w, cur, TW)
        a = r3[:, :half, :].reshape(w * half, TW)
        b = r3[:, half:, :].reshape(w * half, TW)
        mask = jnp.ones((w * half,), jnp.int32)
        rows = masked_add_rows(a, b, mask, interpret=interpret)
        cur = half
    return rows.reshape(w, TW)


def bpr(buckets: jnp.ndarray, num_windows: int, interpret: bool | None = None) -> jnp.ndarray:
    """[W*NB, TW] packed bucket rows -> [W, TW] packed window sums, where
    bucket b (0-based within a window) has weight b+1."""
    nb = buckets.shape[0] // num_windows
    chunk = min(CHUNK, nb)  # chunks must never span windows (nb can be < CHUNK for small c)
    assert nb % chunk == 0, (nb, chunk)
    m, g = bpr_stage1(buckets, chunk=chunk, interpret=interpret)
    chunks_per_window = nb // chunk
    g2 = bpr_stage2(m, g, chunks_per_window, chunk=chunk, interpret=interpret)
    return reduce_rows_per_window(g2, chunks_per_window, interpret=interpret)


# ---------------------------------------------------------------------------
# Device Horner fold: total = sum_w 2^(cbits*w) * S_w.


def _horner_kernel(w, cbits, lanes, consts_ref, s_ref, o_ref):
    """Lane l holds window sum S_l (lanes >= w are identity padding).

    Phase 1: lane l performs cbits*l conditional doublings, yielding
    2^(cbits*l) * S_l (a masked-SIMD power ladder — every lane walks the same
    nd = cbits*(w-1) steps, doubling only while d < cbits*l).
    Phase 2: cyclic rotate-and-add log tree — after log2(lanes) rounds every
    lane holds the full total (the unified full_add absorbs the identity
    padding), so the caller reads row 0."""
    c = load_consts(consts_ref)
    p = pt_unpack(jnp.transpose(s_ref[:]))                       # Pt [L, lanes]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    target = lane * cbits
    nd = cbits * (w - 1)

    def body(d, acc):
        return pt_select(d < target, double(acc, c), acc)

    p = jax.lax.fori_loop(0, nd, body, p)
    shift = 1
    while shift < lanes:
        rot = Pt(*(jnp.concatenate([a[:, shift:], a[:, :shift]], axis=1)
                   for a in p))
        p = full_add(p, rot, c)
        shift *= 2
    pad = jnp.zeros((TW - 4 * LP, lanes), jnp.uint32)
    o_ref[:, :] = jnp.transpose(jnp.concatenate([pt_pack(p), pad], axis=0))


def horner_fold(sums: jnp.ndarray, cbits: int,
                interpret: bool | None = None) -> jnp.ndarray:
    """[W, TW] packed window sums -> [1, TW] packed projective total
    = sum_w 2^(cbits*w) * S_w — the device analogue of the host Horner
    (reference: submission.ts:400-407).  Appended to the BPR program it
    retires the per-MSM host bigint Horner (253 python doublings) and shrinks
    the readback to one point."""
    w = sums.shape[0]
    lanes = 1 << max(3, (w - 1).bit_length())
    if lanes != w:
        from .common import int_to_limbs
        rl = int_to_limbs(PARAMS.r)
        packed_r = rl[0::2] | (rl[1::2].astype(np.uint32) << 16)
        ident = np.zeros((TW,), np.uint32)
        ident[LP:2 * LP] = packed_r
        ident[3 * LP:4 * LP] = packed_r
        sums = jnp.concatenate(
            [sums, jnp.broadcast_to(jnp.asarray(ident), (lanes - w, TW))], axis=0
        )
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    consts = jnp.asarray(make_consts_array())
    out = pl.pallas_call(
        partial(_horner_kernel, w, cbits, lanes),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, TW), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lanes, TW), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lanes, TW), jnp.uint32),
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, sums)
    return out[:1]
