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

Memory layout: each scan step reads one [LBLK, 3*L] tile of gathered table
rows (pre-negated for signed digits) and transposes it in-VMEM to the
[limb, lane] compute layout; the transposes ride the permute unit and are
free next to the 7-product EC add.  Outputs are written two steps per full
(8, 128) tile to avoid lane-padding write amplification.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .common import L, LP, fr_neg_lazy, load_consts, make_consts_array
from .ec import full_add, madd, pt_identity, pt_pack, pt_select, pt_unpack

#: Entries per fragment (scan depth) and fragment-lanes per kernel block.
K = 64
LBLK = 256

#: Accumulator/output row width in u32 (packed x,y,t,z + padding).
TW = 64
#: Table row width in u32: the cached form y-x, y+x, 2*d*t unpacked at cols
#: 0..59.  Neither plain x/y nor t is stored — segments start from the
#: identity and madd(identity, P) reconstructs the extended form, so the scan
#: only needs the three cached coords the 7-product madd consumes
#: (ops/pallas/ec.py).  Gathers are row-count-bound, so unpacked rows are free
#: and save the in-kernel limb interleave.  Width stays a full (8, 128) tile:
#: narrower rows make the XLA gather *slower* and force relayouts (measured:
#: TWR=64 cost +12 ms at 2^20 and doubled compile time).  Re-probed under the
#: round-5 DMA gather (experiments/row_width_probe.py): 64/32-u32 rows cannot
#: ride the DMA row-copy at all (Mosaic (1, 128) lane tiling rejects sub-tile
#: descriptors) and the XLA fallback degrades 110 -> 122 -> 334 ms per 2^23
#: rows at 128/64/32 — TWR=128 re-affirmed (MEASUREMENTS.md round-5 entry).
TWR = 128


from .common import interpret_default as _interpret_default  # noqa: E402


# ---------------------------------------------------------------------------
# Main scan kernel.


def _msm_scan_kernel(lblk, consts_ref, rows_ref, keys_ref, out_ref):
    """rows_ref: [lblk, K, TWR] gathered table rows (cached y-x, y+x, 2*d*t
    unpacked, pre-negated for signed digits); keys_ref: [K, lblk] bucket keys;
    out_ref: [lblk, K//2, 2*TW] inclusive in-fragment scan values — steps
    (2i, 2i+1) packed side by side in one 128-lane row (see _msm_scan_body).

    Each new segment starts from the identity and madds its first point into
    it — the unified hwcd formula is complete, so madd(identity, P)
    reconstructs P's extended form and the table never needs the plain t
    coordinate; signed-bucket negation is pre-applied in the doubled table
    (ops/msm_pipeline.py::build_full_table), so the step is select + madd
    only."""
    _msm_scan_body(lblk, consts_ref, lambda j: rows_ref[:, j, 0:3 * L],
                   keys_ref, out_ref)


def _msm_scan_body(lblk, consts_ref, read_rows, keys_ref, out_ref,
                   read_slab=None, read_same=None, signed_bit=False,
                   store_quarter=False):
    """Shared scan loop: read_rows(j) -> [lblk, >=3*L] slab of table rows for
    step j (entries on sublanes), or read_slab(j) -> [3*L, lblk] already
    limb-major (pre-transposed input; skips the per-step in-kernel
    transpose).  When read_same(j) -> [1, lblk] bool is given, the
    same-segment mask is precomputed outside the kernel (keys_to_sames) and
    the kprev loop state plus both per-half-step compares drop out.
    With signed_bit=True, read_same(j) instead yields the raw [1, lblk] int32
    mask word whose bit 0 is the same-segment flag and bit 1 the digit sign;
    negative digits negate the table row in-kernel (swap y-x/y+x, 4p - 2dt),
    halving the gathered table to n rows (single-table layout).

    Output rows are 2*TW=128 lanes wide holding two consecutive steps: a
    [*, TW=64] output block gets physically padded to 128 lanes by the (8,128)
    tiling, doubling write traffic — buffering one step and writing pairs at
    full tiles is worth ~8% of the whole kernel (measured,
    experiments/scan_out_probe.py).

    With store_quarter=True only steps (4i+2, 4i+3) are stored (out_ref is
    [lblk, K//4, 2*TW]) — both packs happen back-to-back at the tail of each
    4-step body, so unlike the rejected odd-step half-store
    (docs/MEASUREMENTS.md "Half-store scan output") no packed value is held
    across further madd steps; extraction reconstructs values at steps
    4i/4i+1 with <= 2 in-kernel madds (ops/pallas/ec.py::
    extract_reconstruct_rows) — VERDICT r4 #2."""
    c = load_consts(consts_ref)
    ident = pt_identity((L, lblk), c)
    key0 = jnp.full((1, lblk), -1, jnp.int32)
    pad = jnp.zeros((TW - 4 * LP, lblk), jnp.uint32)

    def step(j, acc, kprev):
        if read_slab is not None:
            slab = read_slab(j)                          # [3*L, lblk]
        else:
            slab = jnp.transpose(read_rows(j))           # [3*L, lblk]
        d2 = slab[0 * L:1 * L]
        s2 = slab[1 * L:2 * L]
        td2 = slab[2 * L:3 * L]

        if signed_bit:
            # Single-table layout: apply the digit sign here.  Negating an
            # Edwards point (x,y) -> (-x,y) swaps the cached y-x / y+x rows
            # and negates 2*d*t (td2 < 2.6p < 3p so fr_neg_lazy's 4p - v is
            # borrow-free; see ops/pallas/convert.py bounds).
            bits = read_same(j)                              # [1, lblk] i32
            same = (bits & 1) != 0
            neg = (bits & 2) != 0
            d2, s2 = (jnp.where(neg, s2, d2), jnp.where(neg, d2, s2))
            td2 = jnp.where(neg, fr_neg_lazy(td2, c), td2)
            kj = kprev
        elif read_same is not None:
            same, kj = read_same(j), kprev
        else:
            kj = keys_ref[pl.ds(j, 1), :]                     # [1, lblk]
            same = kj == kprev
        acc = madd(pt_select(same, acc, ident), d2, s2, td2, c)
        return acc, kj

    if store_quarter:
        def body_q(j4, state):
            acc, kprev = step(4 * j4, *state)
            acc, kprev = step(4 * j4 + 1, acc, kprev)
            acc, kprev = step(4 * j4 + 2, acc, kprev)
            even = jnp.concatenate([pt_pack(acc), pad], axis=0)  # [TW, lblk]
            acc, kprev = step(4 * j4 + 3, acc, kprev)
            odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
            out_ref[:, j4, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
            return acc, kprev

        jax.lax.fori_loop(0, K // 4, body_q, (ident, key0))
        return

    def body(j2, state):
        acc, kprev = state
        acc, kprev = step(2 * j2, acc, kprev)
        even = jnp.concatenate([pt_pack(acc), pad], axis=0)     # [TW, lblk]
        acc, kprev = step(2 * j2 + 1, acc, kprev)
        odd = jnp.concatenate([pt_pack(acc), pad], axis=0)
        out_ref[:, j2, :] = jnp.transpose(jnp.concatenate([even, odd], axis=0))
        return acc, kprev

    jax.lax.fori_loop(0, K // 2, body, (ident, key0))


def _msm_scan_fused_kernel(lblk, consts_ref, pidx_ref, keys_ref,
                           table_ref, out_ref, scratch_ref):
    """Fused gather+scan EXPERIMENT (measured and rejected — kept as the
    record; see docs/DESIGN.md §6): the whole table slice is VMEM-resident; a
    per-row dynamic-copy loop stages this block's lblk*K rows into scratch,
    then the scan loop consumes scratch.  At real scale on v5e the copies run
    at ~54 M rows/s (slower than XLA's ~80 M rows/s gather from HBM) and do
    NOT overlap the VPU scan work, so the production path keeps the XLA
    gather.

    pidx_ref: [K, lblk] int32 in SMEM (row e=j*lblk+f reads table[pidx[j,f]]).
    table_ref: [ns, TWR] in VMEM.  scratch_ref: [lblk*K, TWR] VMEM."""

    def copy(e, _):
        idx = pidx_ref[e // lblk, e % lblk]
        scratch_ref[pl.ds(e, 1), :] = table_ref[pl.ds(idx, 1), :]
        return 0

    jax.lax.fori_loop(0, lblk * K, copy, 0, unroll=False)

    def read_rows(j):
        return scratch_ref[pl.ds(j * lblk, lblk), 0:3 * L]

    _msm_scan_body(lblk, consts_ref, read_rows, keys_ref, out_ref)


def msm_scan_fused(table: jnp.ndarray, pidx_t: jnp.ndarray, keys_t: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Fused bucket-accumulation scan: gathers rows from the VMEM-resident
    `table` [ns, TWR] by `pidx_t` [K, NF] while scanning.  Returns T
    [NF, K//2, 2*TW] (step pairs per row).  ns*TWR*4 bytes must fit VMEM alongside the working set
    (<= 2^17 rows at TWR=128)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns = table.shape[0]
    nf = pidx_t.shape[1]
    lblk = LBLK
    while nf % lblk != 0:
        lblk //= 2
    grid = (nf // lblk,)
    consts = jnp.asarray(make_consts_array())
    return pl.pallas_call(
        partial(_msm_scan_fused_kernel, lblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, table.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, K // 2, 2 * TW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, K // 2, 2 * TW), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((lblk * K, table.shape[1]), jnp.uint32)],
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(consts, pidx_t, keys_t, table)



def _scan_pallas_call(kernel_body, rows: jnp.ndarray, aux_t: jnp.ndarray,
                      interpret: bool | None, steps_per_row: int = 2) -> jnp.ndarray:
    """Shared launcher for every scan variant: rows is either the row-major
    [NF, K, TWR] gather output or the limb-major [NF//lblk, K, 64, lblk]
    pre-transposed layout; aux_t is the [K, NF] per-step word (sorted keys,
    same-segment bits, or sign|same bits).  kernel_body(lblk, consts_ref,
    rows_ref, aux_ref, out_ref) is the variant's kernel.  Returns T
    [NF, K//2, 2*TW] (step pairs side by side per 128-lane row)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if rows.ndim == 4:
        nfb, _, _, lblk = rows.shape
        nf = nfb * lblk
        rows_spec = pl.BlockSpec((1, K, 64, lblk), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        nf = rows.shape[0]
        lblk = LBLK
        while nf % lblk != 0:
            lblk //= 2
        rows_spec = pl.BlockSpec((lblk, K, rows.shape[-1]), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    consts = jnp.asarray(make_consts_array())
    kout = K // steps_per_row
    return pl.pallas_call(
        partial(kernel_body, lblk),
        grid=(nf // lblk,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            rows_spec,
            pl.BlockSpec((K, lblk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, kout, 2 * TW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, kout, 2 * TW), jnp.uint32),
        interpret=_interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, rows, aux_t)


def _msm_scan_pret_kernel(lblk, consts_ref, rows_ref, keys_ref, out_ref):
    """Pre-transposed variant: rows_ref [1, K, 64, lblk] limb-major slabs
    (cols 0..3L-1 = y-x, y+x, 2*d*t), so each step reads its [3L, lblk] slab
    directly with no in-kernel transpose.  Measured 8.9 vs 10.7 ns/entry at
    lblk=256 (experiments/scan_tune_probe.py); the XLA transpose producing
    this layout fuses into the gather for ~+0.6 ns/entry
    (experiments/gather_layout_probe.py), so the kernel win is net."""
    _msm_scan_body(lblk, consts_ref, lambda j: None, keys_ref, out_ref,
                   read_slab=lambda j: rows_ref[0, j, 0:3 * L, :])


def msm_scan_pret(rows_t: jnp.ndarray, keys_t: jnp.ndarray,
                  interpret: bool | None = None) -> jnp.ndarray:
    """rows_t: [NF//lblk, K, 64, lblk] pre-transposed gathered rows;
    keys_t: [K, NF].  Returns T [NF, K//2, 2*TW] — identical to
    :func:`msm_scan` on the un-transposed layout."""
    return _scan_pallas_call(_msm_scan_pret_kernel, rows_t, keys_t, interpret)


def _msm_scan_sames_kernel(lblk, consts_ref, rows_ref, sames_ref, out_ref):
    """Pre-transposed + hoisted-mask variant: the same-segment bit for every
    step is precomputed by :func:`keys_to_sames` (an XLA shifted compare over
    the sorted keys), so the kernel carries no kprev state and does no
    compares — select + madd only (VERDICT r2 #3 candidate;
    experiments/scan_tune_probe.py `pret+sames`)."""
    _msm_scan_body(lblk, consts_ref, lambda j: None, None, out_ref,
                   read_slab=lambda j: rows_ref[0, j, 0:3 * L, :],
                   read_same=lambda j: sames_ref[pl.ds(j, 1), :] != 0)


def keys_to_sames(keys_t: jnp.ndarray) -> jnp.ndarray:
    """[K, NF] sorted bucket keys -> [K, NF] int32 same-as-previous bits.

    Row 0 is forced to 0: every fragment starts a fresh segment, matching the
    kprev = -1 initialisation of the in-kernel compare (bucket keys are
    non-negative).  Cross-fragment continuation is the carry scan's job either
    way."""
    eq = (keys_t[1:] == keys_t[:-1]).astype(jnp.int32)
    return jnp.concatenate([jnp.zeros((1, keys_t.shape[1]), jnp.int32), eq])


def msm_scan_sames(rows_t: jnp.ndarray, sames_t: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """rows_t: [NF//lblk, K, 64, lblk] pre-transposed gathered rows;
    sames_t: [K, NF] from :func:`keys_to_sames`.  Returns T
    [NF, K//2, 2*TW] — identical to :func:`msm_scan_pret` on the same rows."""
    return _scan_pallas_call(_msm_scan_sames_kernel, rows_t, sames_t, interpret)


def _msm_scan_signed_kernel(lblk, consts_ref, rows_ref, bits_ref, out_ref):
    """Single-table variant: rows are gathered from the n-row (non-negated)
    table; bits_ref packs (same-segment | sign << 1) per step, so negation
    happens in-kernel (one row swap + one borrow-free 4p - v next to the
    7-product madd).  Halving the gather's source table from 2n to n rows
    buys back the XLA gather's table-size penalty
    (experiments/table_size_probe.py)."""
    _msm_scan_body(lblk, consts_ref, lambda j: None, None, out_ref,
                   read_slab=lambda j: rows_ref[0, j, 0:3 * L, :],
                   read_same=lambda j: bits_ref[pl.ds(j, 1), :],
                   signed_bit=True)


def msm_scan_signed(rows_t: jnp.ndarray, bits_t: jnp.ndarray,
                    interpret: bool | None = None) -> jnp.ndarray:
    """rows_t: [NF//lblk, K, 64, lblk] pre-transposed rows gathered from the
    SINGLE (non-negated) table; bits_t: [K, NF] int32 with bit 0 = same-as-
    previous (keys_to_sames) and bit 1 = digit sign.  Returns T
    [NF, K//2, 2*TW] — identical to :func:`msm_scan_sames` fed the doubled
    pre-negated table."""
    return _scan_pallas_call(_msm_scan_signed_kernel, rows_t, bits_t, interpret)


def _msm_scan_rm_sames_kernel(lblk, consts_ref, rows_ref, sames_ref, out_ref):
    """Row-major input + hoisted same-segment mask: reads the XLA gather's
    natural [lblk, K, TWR] output directly (no gather-side transpose pass —
    the per-step [lblk, 3L] transpose rides the in-kernel permute unit), with
    the mask precomputed by keys_to_sames.  Candidate production layout: the
    XLA transpose feeding the pret kernel costs ~8-10 ms/group while pret only
    saves ~4-5 (round-3 stages bench); this variant takes neither hit."""
    _msm_scan_body(lblk, consts_ref, lambda j: rows_ref[:, j, 0:3 * L], None,
                   out_ref, read_same=lambda j: sames_ref[pl.ds(j, 1), :] != 0)


def msm_scan_rm_sames(rows: jnp.ndarray, sames_t: jnp.ndarray,
                      interpret: bool | None = None) -> jnp.ndarray:
    """rows: [NF, K, TWR] gathered table rows (pre-negated, row-major — the
    gather's natural layout); sames_t: [K, NF] from :func:`keys_to_sames`.
    Returns T [NF, K//2, 2*TW] — identical to :func:`msm_scan` on the same
    rows/keys."""
    return _scan_pallas_call(_msm_scan_rm_sames_kernel, rows, sames_t, interpret)


def _msm_scan_rm_sames_q_kernel(lblk, consts_ref, rows_ref, sames_ref, out_ref):
    """Quarter-store production candidate (VERDICT r4 #2): the rm+sames scan
    storing only steps (4i+2, 4i+3) — write traffic halved again vs the
    pair-packed layout, extraction reconstructs the unstored steps with <= 2
    fused madds (ec.py::extract_reconstruct_rows)."""
    _msm_scan_body(lblk, consts_ref, lambda j: rows_ref[:, j, 0:3 * L], None,
                   out_ref, read_same=lambda j: sames_ref[pl.ds(j, 1), :] != 0,
                   store_quarter=True)


def msm_scan_rm_sames_q(rows: jnp.ndarray, sames_t: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    """rows: [NF, K, TWR] gathered table rows (pre-negated, row-major);
    sames_t: [K, NF] from :func:`keys_to_sames`.  Returns T-quarter
    [NF, K//4, 2*TW]: row j holds the inclusive scan values at steps
    (4j+2, 4j+3) side by side; values at steps 4j/4j+1 are reconstructed at
    extraction (msm_pipeline quarter path)."""
    return _scan_pallas_call(_msm_scan_rm_sames_q_kernel, rows, sames_t,
                             interpret, steps_per_row=4)


def _msm_scan_rm_signed_kernel(lblk, consts_ref, rows_ref, bits_ref, out_ref):
    """Row-major input + hoisted (same | sign << 1) mask word: the
    single-table analogue of the rm+sames kernel — rows come straight from
    the gather of the non-negated table and negation happens in-kernel.
    Used by the fixed-base merged path (ops/precompute.py), whose W'-times
    table makes the halved (single-table) HBM footprint mandatory."""
    _msm_scan_body(lblk, consts_ref, lambda j: rows_ref[:, j, 0:3 * L], None,
                   out_ref, read_same=lambda j: bits_ref[pl.ds(j, 1), :],
                   signed_bit=True)


def msm_scan_rm_signed(rows: jnp.ndarray, bits_t: jnp.ndarray,
                       interpret: bool | None = None) -> jnp.ndarray:
    """rows: [NF, K, TWR] row-major rows gathered from the SINGLE
    (non-negated) table; bits_t: [K, NF] int32 with bit 0 = same-as-previous
    and bit 1 = digit sign.  Returns T [NF, K//2, 2*TW] — identical to
    :func:`msm_scan_rm_sames` fed the doubled pre-negated table."""
    return _scan_pallas_call(_msm_scan_rm_signed_kernel, rows, bits_t, interpret)


def msm_scan(rows: jnp.ndarray, keys_t: jnp.ndarray,
             interpret: bool | None = None) -> jnp.ndarray:
    """rows: [NF, K, TWR] (pre-negated); keys_t: [K, NF].  Returns T
    [NF, K//2, 2*TW] — steps (2i, 2i+1) side by side per 128-lane row."""
    return _scan_pallas_call(_msm_scan_kernel, rows, keys_t, interpret)


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
