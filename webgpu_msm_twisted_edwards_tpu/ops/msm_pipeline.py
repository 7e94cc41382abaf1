"""Production MSM device pipeline (Pallas path).

End-to-end re-design of the reference cuZK orchestrator
(reference: src/submission/submission.ts:73-412) for TPU:

    1. convert (Pallas) + decompose — build the doubled Montgomery point
       (XLA)                            table (y-x, y+x, 2*d*t raw limbs; negated
                                      rows in the upper half) and signed
                                      window digits.
    2. sort (XLA lax.sort)          — per window, order (bucket, signed row);
                                      replaces the atomics CSR transpose
                                      (reference: transpose.wgsl:34-74).
    3. gather (XLA)                 — one row gather of table rows into sorted
                                      order (the only large data movement).
    4. segmented scan (Pallas)      — bucket sums via fragment scans; exactly
                                      W*n mixed adds (reference SMVP analogue:
                                      smvp.template.wgsl:60-149).
    5. carry scan + extraction      — stitch buckets spanning fragments, pull
                                      per-bucket sums at segment ends.
    6. BPR (Pallas)                 — running-sum reduction to window sums
                                      (reference: bpr.template.wgsl).
    7. host                         — un-Montgomery, Horner over windows
                                      (reference: submission.ts:363-412).

Data stays on device between stages; only the [W] window sums are read back.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.aot_cache import aot_jit
from ..utils.params import PARAMS, MsmConfig
from . import convert as CV
from .pallas import bpr as PB
from .pallas import convert as PC
from .pallas import gather as GA
from .pallas import hist as HG
from .pallas import scan as PS
from .pallas import ec as EC
from .pallas.common import LP, int_to_limbs
from .pallas.ec import masked_add_rows

L = PARAMS.num_words
TW = PS.TW

#: A/B switch for the hoisted same-segment-mask scan variant (read once at
#: import; see window_group_bucket_sums).  Default ON: measured 496.5 vs
#: 501.0 ms end-to-end at 2^20 on v5e (oracle MATCH both ways); set
#: MSM_SCAN_SAMES=0 to fall back to the in-kernel compare.
_SCAN_SAMES = os.environ.get("MSM_SCAN_SAMES", "1") == "1"

#: Opt-in single-table layout: gather from the n-row table and apply the
#: digit sign in-kernel (bit 1 of the hoisted mask word) instead of gathering
#: from the 2n-row pre-negated doubled table.  Measured at 2^20 on v5e: the
#: gather rate is INsensitive to source-table size
#: (experiments/table_size_probe.py: 110.8 vs 114.4 ms at 2^21 vs 2^20 rows),
#: so this trades ~12 ms/MSM of in-kernel negation (510.3 vs 497.8 end-to-end,
#: oracle MATCH) for half the table's HBM footprint — useful headroom at
#: streaming-path block sizes, not a speed win; default OFF.
_SINGLE_TABLE = os.environ.get("MSM_SINGLE_TABLE", "0") == "1"

#: Scan input layout: "rm" (default) feeds the gather's natural row-major
#: output straight into the kernel, which transposes each [lblk, 3L] step
#: slab on the in-kernel permute unit; "pret" gathers into a limb-major
#: layout (the transpose fuses into the gather's output pass) feeding the
#: transpose-free kernel.  Measured end-to-end at 2^20 on v5e (oracle MATCH
#: both ways): rm 490.0 ms vs pret 497.8 — the XLA gather-side transpose
#: costs ~8-10 ms/group while the transpose-free kernel only saves ~4-5
#: (round-3 stages bench), so rm wins net.
_SCAN_LAYOUT = os.environ.get("MSM_SCAN_LAYOUT", "rm")

#: A/B switch for the DMA-engine row gather (ops/pallas/gather.py) on the
#: row-major production path; measured 106 vs 77 M rows/s against the XLA
#: gather at 2^23 rows on v5e (experiments/dma_gather_probe.py).  Set
#: MSM_DMA_GATHER=0 to fall back to the XLA gather.
_DMA_GATHER = os.environ.get("MSM_DMA_GATHER", "1") == "1"

#: A/B switch routing the EXTRACTION row gathers (scan-value rows, carry
#: rows) through the DMA-engine gather instead of XLA gathers — the round-4
#: budget prices them at ~20 ms/MSM at 2^20 (end-gather 8.4 + extraction row
#: gathers ~11.5, VERDICT r4 #6).  Measured an exact end-to-end wash at 2^20
#: (411.3 vs 411.3 ms, oracle MATCH) — default OFF to keep XLA's fusion
#: freedom (docs/MEASUREMENTS.md round-5 smalls entry).
_DMA_EXTRACT = os.environ.get("MSM_DMA_EXTRACT", "0") == "1"

#: A/B switch for the i64 packed sort: (key << 32) | idx sorted as ONE
#: operand instead of the 2-operand variadic (key, payload) sort.  Standalone
#: the two are a wash (experiments/sort_pack_probe.py: 50.3 vs 52.5 ms at
#: [8, 2^20]); this switch exists to re-test IN CONTEXT, where the round-4
#: XProf budget attributes ~11 ms at 2^20 to payload split/concat fusions
#: around the variadic sort (VERDICT r4 #6).  In context it LOSES: 418.8 vs
#: 411.3 ms at 2^20 (oracle MATCH) — the pack/unpack shifts sit on the
#: critical path while the payload splits schedule into gaps; default OFF
#: (docs/MEASUREMENTS.md round-5 smalls entry).
_SORT_I64 = os.environ.get("MSM_SORT_I64", "0") == "1"

#: A/B switch for the quarter-store scan (VERDICT r4 #2): the scan kernel
#: stores only steps (4i+2, 4i+3) — write traffic halved — and extraction
#: reconstructs unstored steps with <= 2 madds fused into the carry-combine
#: kernel (ops/pallas/ec.py::extract_reconstruct_rows).  Only the production
#: rm+sames doubled-table path supports it.  Measured and REJECTED: 459.2 vs
#: 411.3 ms at 2^20 (oracle MATCH both) — holding packed values across 4
#: steps extends accumulator live ranges and the fused reconstruction still
#: pays two extra row gathers per group; the pair-store layout is final
#: (docs/MEASUREMENTS.md round-5 quarter-store entry).
_SCAN_QSTORE = os.environ.get("MSM_SCAN_QSTORE", "0") == "1"

#: Below this many gathered rows per group the XLA gather wins instead —
#: the DMA kernel's fixed costs (descriptor-issue ramp, no fusion with the
#: surrounding program) dominate at small n.  Measured end-to-end series
#: (fresh-process medians, oracle MATCH; docs/MEASUREMENTS.md round-5 gate
#: entry): 1.3 M rows/group (2^16/c=13) XLA 50.4 vs DMA 60.7; 2.6 M
#: (2^17/c=13) 95 vs 87.8; 3.4 M (2^18/c=13) 154.0 vs 137.0; 4.2 M
#: (2^19/c=16) 270.3 vs 238.4; 16.8 M (2^22/c=16) 2461.6 vs 2226.3 —
#: monotone around one crossover between 1.3 M and 2.6 M; the 2^21 gate sits
#: inside the bracket.  Env-overridable for gate probes
#: (MSM_DMA_GATHER_MIN_ROWS).
_DMA_GATHER_MIN_ROWS = int(os.environ.get("MSM_DMA_GATHER_MIN_ROWS", 1 << 21))
K = PS.K


def identity_row_np() -> np.ndarray:
    """Packed (0, R, 0, R) identity row of width TW."""
    r = int_to_limbs(PARAMS.r)
    packed_r = r[0::2] | (r[1::2].astype(np.uint32) << 16)
    row = np.zeros(TW, dtype=np.uint32)
    row[LP:2 * LP] = packed_r          # y = R
    row[3 * LP:4 * LP] = packed_r      # z = R
    return row


def pack_cols(a: jnp.ndarray) -> jnp.ndarray:
    """[n, L] limb-last -> [n, LP] packed 2-per-u32."""
    return a[:, 0::2] | (a[:, 1::2] << 16)


def build_table(coords_u32: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """[n, 2, 8] affine coordinate words -> [n, TWR] Montgomery table rows
    (cached y-x, y+x, 2*d*t raw limbs) via the Pallas convert kernel
    (reference analogue:
    convert_point_coords_and_decompose_scalars.template.wgsl:39-77)."""
    return PC.build_table(coords_u32, interpret=interpret)


def build_full_table(coords_u32: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """[n, 2, 8] -> [2n, TWR]: rows 0..n-1 are the points, rows n..2n-1 their
    negations (both produced by the convert kernel in one pass,
    PC.build_table_doubled — no concat copy), so a signed digit's sign rides
    the gather index (row + n) and the scan kernel needs no per-entry
    negation (the signed-bucket negation of smvp.template.wgsl:47-56,
    precomputed once per point instead of per (window, entry))."""
    return PC.build_table_doubled(coords_u32, interpret=interpret)


def build_prod_table(coords_u32: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """The production table for the configured layout: [2n, TWR] doubled
    pre-negated rows, or [n, TWR] single-table rows when MSM_SINGLE_TABLE=1
    (the sign is then applied in-kernel by msm_scan_signed)."""
    if _SINGLE_TABLE:
        return build_table(coords_u32, interpret=interpret)
    return build_full_table(coords_u32, interpret=interpret)


def window_group_bucket_sums(
    table: jnp.ndarray,
    digits_g: jnp.ndarray,
    nb: int,
    interpret: bool | None = None,
    fused: bool = False,
    table_base=None,
) -> jnp.ndarray:
    """digits_g: [Wg, n] signed window digits for one group of windows;
    table: [2n, TWR] doubled rows (negated points in the upper half).
    Returns packed bucket sums [Wg * nb, TW] (bucket key b holds the sum of
    points with |digit| == b+1, sign applied).

    table_base (traced int32 scalar) selects fixed-base block mode: the table
    is a single-table (in-kernel sign) array larger than the digit block, and
    entry i reads row table_base + i — used by the precomputed-SRS path
    (ops/precompute.py) to stream entry blocks of the merged window-major
    table without slicing it."""
    wg, n = digits_g.shape
    if table_base is not None:
        single = True                      # merged fixed-base table block
        # The block may extend past the table (entries are padded to the
        # block grid with zero digits); padded rows clip in the gather and
        # their sentinel buckets are never extracted.
    else:
        single = table.shape[0] == n       # single-table (in-kernel sign) mode
        assert table.shape[0] == (n if single else 2 * n), (table.shape, n)
    d = digits_g
    sign_neg = d < 0
    keys = jnp.where(d == 0, jnp.int32(nb), jnp.abs(d) - 1)          # [Wg, n]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], keys.shape)
    if table_base is not None:
        idx = idx + table_base
    # Doubled table: the sign selects the pre-negated half (row idx + n).
    # Single table: the sign rides payload bit 30 and is applied in-kernel.
    # Fusing key|sign|idx into ONE sortable word was measured and REJECTED:
    # the variadic 2-operand sort compares only the 4-byte key, so a packed
    # u32 is 13% slower (37.6 -> 42.7 ms at [8, 2^18]/c=13) and a packed i64
    # is a wash at [8, 2^20]/c=16 (experiments/sort_pack_probe.py).
    sbit = jnp.int32(1 << 30) if single else jnp.int32(n)
    idxs = jnp.where(sign_neg, idx + sbit, idx)
    if _SORT_I64:
        # One-operand i64 sort: both fields non-negative, key in the high
        # word, so i64 order == (key, idx) lexicographic order and the low
        # word unpacks exactly (idx < 2^31).  x64 is enabled only for this
        # trace-time window; inputs/outputs stay i32.  Bucket contents are
        # identical; within-bucket entry ORDER can differ from the stable
        # variadic sort (ties break by idx value, not pre-sort position), so
        # packed representatives may differ while the group elements match.
        with jax.enable_x64(True):
            kv = (keys.astype(jnp.int64) << 32) | idxs.astype(jnp.int64)
            kv_s = lax.sort(kv, dimension=1)
            keys_s = (kv_s >> 32).astype(jnp.int32)
            idxs_s = kv_s.astype(jnp.int32)
    else:
        keys_s, idxs_s = lax.sort((keys, idxs), dimension=1, num_keys=1)

    # Bucket end positions / counts (the CSC col_ptr analogue).  Derived from
    # an MXU one-hot-matmul histogram (ops/pallas/hist.py) + cumsum — at 2^20
    # this replaced a ~50 ms/group vectorized binary-search searchsorted
    # (round-2's best XLA formulation; method="sort" and segment_sum measured
    # worse still — see experiments/extraction_probe.py history in
    # docs/DESIGN.md §5).  The histogram is order-independent, so it reads
    # the pre-sort keys and XLA can schedule it independently of the sort.
    if nb % 128 == 0:
        counts = HG.bucket_counts(keys, nb, interpret=interpret)     # [Wg, nb]
        ends = jnp.cumsum(counts, axis=1) - 1                        # [Wg, nb]
    else:
        # Tiny windows (c < 8, off the production gate): binary search.
        queries = jnp.arange(nb + 1, dtype=jnp.int32)
        offsets = jax.vmap(
            lambda row: jnp.searchsorted(row, queries, side="left")
        )(keys_s)
        counts = offsets[:, 1:] - offsets[:, :nb]
        ends = offsets[:, 1:] - 1

    # One bulk gather into sorted order.  The flattened entry count is padded
    # with sentinel entries (appended after all real windows — their carries
    # and scan values are never extracted) so the fragment count is a
    # multiple of 128 (Mosaic's lane-dim block rule).
    wofs = (jnp.arange(wg, dtype=jnp.int32) * (nb + 2))[:, None]
    gkeys = keys_s + wofs
    flat_keys = keys_s.reshape(-1)
    flat_gkeys = gkeys.reshape(-1)
    flat_pidx = idxs_s.reshape(-1)
    total = wg * n
    nf = -(-(total // K) // 128) * 128
    pad_e = nf * K - total
    if pad_e:
        flat_keys = jnp.concatenate([flat_keys, jnp.full((pad_e,), nb, jnp.int32)])
        flat_gkeys = jnp.concatenate(
            [flat_gkeys, jnp.full((pad_e,), (wg - 1) * (nb + 2) + nb, jnp.int32)]
        )
        flat_pidx = jnp.concatenate([flat_pidx, jnp.zeros((pad_e,), jnp.int32)])

    keys_t = flat_keys.reshape(nf, K).T                              # [K, NF]
    quarter_rows = None                    # set by the quarter-store rm path
    if single:
        flat_neg = flat_pidx >> 30                                   # sign bit
        flat_pidx = flat_pidx & jnp.int32((1 << 30) - 1)

    if fused:
        # EXPERIMENT path (measured slower; see msm_scan_fused docstring).
        assert not single, "fused experiment path needs the doubled table"
        pidx_t = flat_pidx.reshape(nf, K).T                          # [K, NF]
        t_scan = PS.msm_scan_fused(table, pidx_t, keys_t, interpret=interpret)
    elif _SCAN_LAYOUT == "rm":
        # Row-major layout: feed the gather's natural output straight into
        # the kernel (per-step transposes ride the in-kernel permute unit);
        # skips the gather-side transpose pass entirely.
        if _DMA_GATHER and wg * n >= _DMA_GATHER_MIN_ROWS:
            # DMA-engine gather: ~30% faster than the XLA gather on v5e
            # (ops/pallas/gather.py; 106 vs 77 M rows/s measured); XLA
            # gather below the crossover (see _DMA_GATHER_MIN_ROWS).
            pidx_t = flat_pidx.reshape(nf, K).T
            rows = GA.dma_row_gather(table, pidx_t, interpret=interpret)
            rows = rows.reshape(nf, K, PS.TWR)
        else:
            rows = table[flat_pidx].reshape(nf, K, PS.TWR)
        if single:
            # Single-table: digit sign rides bit 1 of the hoisted mask word,
            # negation happens in-kernel (msm_scan_rm_signed).
            bits_t = PS.keys_to_sames(keys_t) | (flat_neg.reshape(nf, K).T << 1)
            t_scan = PS.msm_scan_rm_signed(rows, bits_t, interpret=interpret)
        elif _SCAN_QSTORE:
            t_scan = PS.msm_scan_rm_sames_q(rows, PS.keys_to_sames(keys_t),
                                            interpret=interpret)
            quarter_rows = rows            # reconstruction reads the scan input
        else:
            t_scan = PS.msm_scan_rm_sames(rows, PS.keys_to_sames(keys_t),
                                          interpret=interpret)
    else:
        # Gather into the scan kernel's limb-major layout: the transpose
        # fuses into the gather's output (~+0.6 ns/entry,
        # experiments/gather_layout_probe.py) and the pre-transposed kernel
        # drops the per-step in-kernel transpose (10.7 -> 8.9 ns/entry,
        # experiments/scan_tune_probe.py).  Only cols 0..3L-1 (y-x, y+x, 2*d*t,
        # padded to 64) are carried forward.
        lblk = PS.LBLK
        while nf % lblk != 0:
            lblk //= 2
        rows = table[flat_pidx]                                      # [NF*K, TWR]
        rows = rows.reshape(nf // lblk, lblk, K, PS.TWR)[:, :, :, :64]
        rows_t = jnp.transpose(rows, (0, 2, 3, 1))                   # [NFB, K, 64, lblk]
        if single:
            # Sign bit rides the hoisted mask word (bit 1); negation happens
            # in-kernel so the gather reads the half-size table.
            bits_t = PS.keys_to_sames(keys_t) | (flat_neg.reshape(nf, K).T << 1)
            t_scan = PS.msm_scan_signed(rows_t, bits_t, interpret=interpret)
        elif _SCAN_SAMES:
            # Default: hoist the same-segment compare out of the kernel
            # (experiments/scan_tune_probe.py pret+sames; −4.5 ms at 2^20).
            t_scan = PS.msm_scan_sames(rows_t, PS.keys_to_sames(keys_t),
                                       interpret=interpret)
        else:
            t_scan = PS.msm_scan_pret(rows_t, keys_t, interpret=interpret)
    # t_scan: [NF, K//2, 2*TW] — step pairs side by side per 128-lane row
    # ([NF, K//4, 2*TW] holding steps (4i+2, 4i+3) on the quarter-store path).
    is_quarter = _SCAN_QSTORE and quarter_rows is not None

    # Cross-fragment carries.  Global keys make runs never span windows.
    gk_frag = flat_gkeys.reshape(nf, K)
    fk = gk_frag[:, 0]
    lk = gk_frag[:, -1]
    fk_next = jnp.concatenate([fk[1:], jnp.full((1,), -7, jnp.int32)])
    cont = (lk == fk_next).astype(jnp.int32)
    single = (fk == lk).astype(jnp.int32)
    a = cont * single
    sfx = t_scan[:, -1, TW:]                                         # [NF, TW]
    ident = jnp.asarray(identity_row_np())
    b = jnp.where((cont != 0)[:, None], sfx, ident[None, :])
    carries = PS.seg_carry_scan(a, b, interpret=interpret)           # [NF, TW]

    # Extraction at segment ends.
    ends_c = jnp.clip(ends, 0, n - 1)
    flat_end = (jnp.arange(wg, dtype=jnp.int32)[:, None] * n + ends_c).reshape(-1)

    dma_x = _DMA_EXTRACT and not PS._interpret_default(interpret)
    xgather = GA.dma_gather_flat if dma_x else (lambda t, i: t[i])

    frag = ends_c // K                                               # fragment within window? -> global
    gfrag = (jnp.arange(wg, dtype=jnp.int32)[:, None] * (n // K) + frag).reshape(-1)
    cval = xgather(carries, gfrag)                                   # [Wg*NB, TW]
    fragstart_key = jnp.take_along_axis(keys_s, (ends_c // K) * K, axis=1)  # [Wg, NB]
    bucket_ids = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None], (wg, nb))
    mask_c = ((fragstart_key == bucket_ids) & (counts > 0)).reshape(-1).astype(jnp.int32)
    nonzero = (counts > 0).reshape(-1)

    if is_quarter:
        # Quarter-store extraction (VERDICT r4 #2): fragment-local step
        # s = 4q + r.  r >= 2: the value is stored (row q, half r-2).
        # r < 2: start from stored T[4q-1] (row q-1, odd half; restart handled
        # by the same-segment bit of step 4q — a fragment's step 0 always
        # restarts) and replay <= 2 scan steps inside the extraction kernel.
        s = flat_end & (K - 1)
        q = s >> 2
        r = s & 3
        direct = r >= 2
        gq = (flat_end >> 6) * (K // 4) + q                          # global quarter row
        t2dq = t_scan.reshape(nf * (K // 4), 2 * TW)
        stored = xgather(t2dq, jnp.clip(jnp.where(direct, gq, gq - 1), 0))
        use_odd = jnp.where(direct, r - 2, 1)
        base = jnp.where((use_odd == 1)[:, None], stored[:, TW:], stored[:, :TW])
        # Scan-input rows for steps 4q, 4q+1 — adjacent, one paired gather.
        flat_rows2 = quarter_rows.reshape(nf * K // 2, 2 * PS.TWR)
        pair_in = xgather(flat_rows2, (flat_end - r) >> 1)           # [NE, 2*TWR]
        # Same-segment bits from the padded sorted keys (identical semantics
        # to keys_to_sames: a fragment's step 0 restarts unconditionally).
        fe0 = flat_end - r
        k0 = flat_keys[fe0]
        km1 = flat_keys[jnp.clip(fe0 - 1, 0)]
        k1 = flat_keys[jnp.clip(fe0 + 1, 0, flat_keys.shape[0] - 1)]
        same1 = (k0 == km1) & ((fe0 & (K - 1)) != 0)
        same2 = k1 == k0
        bits = ((r < 2).astype(jnp.int32)
                | ((r == 1).astype(jnp.int32) << 1)
                | (same1.astype(jnp.int32) << 2)
                | (same2.astype(jnp.int32) << 3)
                | (mask_c << 4))
        buckets = EC.extract_reconstruct_rows(base, pair_in, bits, cval,
                                              interpret=interpret)
    else:
        # Entry e lives at pair-row e//2, half e%2 (K is even, so e//2 ==
        # (e//K)*(K//2) + (e%K)//2 — the reshape below is exactly pair-rows).
        t2d = t_scan.reshape(nf * (K // 2), 2 * TW)
        pair_rows = xgather(t2d, flat_end >> 1)                      # [Wg*NB, 2*TW]
        odd = (flat_end & 1) == 1
        tval = jnp.where(odd[:, None], pair_rows[:, TW:], pair_rows[:, :TW])
        buckets = masked_add_rows(tval, cval, mask_c, interpret=interpret)
    buckets = jnp.where(nonzero[:, None], buckets, ident[None, :])
    return buckets                                                   # [Wg*NB, TW]


#: Empirical peak device-memory footprint per staged (window, point) entry in
#: one window group: gather output (512 B physical) + scan output (256 B,
#: pair-packed) + sort keys/payloads + XLA copies.  Round-1 measured ~13 GB
#: peak at 2^22 with window_group=2; 1300 B/entry at a 0.85 budget (table
#: accounted separately) yields the measured-fastest caps on 16 GB: wg=8 at
#: 2^20 (472.3 ms), 4 at 2^21 (929.9), 1 at 2^22 (wg=2 ran 13.1 GB peak and
#: measured 1.4% SLOWER than wg=1 — allocator pressure near the budget edge,
#: round-3 bench logs).
_STAGING_BYTES_PER_ENTRY = 1300


def default_window_group(n: int, num_windows: int) -> int:
    """Largest divisor of num_windows whose per-group staging fits the
    device-memory budget (reference analogue: the reference splits SMVP into
    num_subtask_chunk_size=4 dispatches for the same reason,
    submission.ts:233-274)."""
    from ..utils.runtime import device_memory_bytes

    tf = 1 if _SINGLE_TABLE else 2          # doubled (pre-negated) or single
    table_bytes = tf * n * PS.TWR * 4
    budget = int(0.85 * device_memory_bytes()) - table_bytes
    cap = max(1, budget // (n * _STAGING_BYTES_PER_ENTRY))
    return max(d for d in range(1, num_windows + 1) if num_windows % d == 0 and d <= cap)


def msm_window_sums(
    coords_u32: jnp.ndarray,
    scalars_u32: jnp.ndarray,
    cfg: MsmConfig,
    window_group: int = 0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Full device pipeline: [n,2,8], [n,8] -> [W, TW] packed window sums.

    One traceable function (usable under a single jit / shard_map).  For the
    single-chip production path prefer :func:`msm_window_sums_staged`, which
    runs the same stages as separate compiled programs — same answer, far
    cheaper XLA compile (the window-group loop body compiles once and the
    whole-program optimizer never sees the full pipeline graph).

    window_group = 0 chooses a memory-bounded default derived from reported
    device memory (see :func:`default_window_group`)."""
    n = coords_u32.shape[0]
    # Fragment bookkeeping (gfrag = w*(n//K)+frag) assumes window boundaries
    # align with K-entry scan fragments; a non-multiple would silently
    # mis-bucket.  compute_msm pads to 4096; direct callers must pad too.
    assert n % K == 0, f"n={n} must be a multiple of the scan fragment size {K}"
    w = cfg.num_windows
    nb = cfg.num_buckets
    if window_group == 0:
        window_group = default_window_group(n, w)
    assert w % window_group == 0
    groups = w // window_group

    table = build_prod_table(coords_u32, interpret=interpret)
    digits = CV.decompose_scalars_signed(scalars_u32, cfg)           # [n, W]
    digits_t = digits.T.reshape(groups, window_group, n)

    fn = partial(window_group_bucket_sums, table, nb=nb, interpret=interpret)
    if groups == 1:
        buckets = fn(digits_t[0])
    else:
        buckets = lax.map(fn, digits_t).reshape(groups * window_group * nb, TW)
    buckets = buckets.reshape(w * nb, TW)

    return PB.bpr(buckets, w, interpret=interpret)                   # [W, TW]


# ---------------------------------------------------------------------------
# Staged execution: the same pipeline as a handful of separately compiled
# programs.  XLA dispatch is asynchronous, so the extra program boundaries
# cost nothing at runtime, while compile time drops dramatically: the
# window-group program is compiled once and re-dispatched per group instead
# of being wrapped in a lax.map inside one giant program (the analogue of the
# reference compiling 4 small shaders instead of one mega-shader,
# shader_manager.ts:95-208).


@aot_jit(static_argnames=("chunk_size", "interpret"))
def _stage_table_digits(coords_u32, scalars_u32, chunk_size: int,
                        interpret: bool | None):
    cfg = MsmConfig(chunk_size=chunk_size)
    table = build_prod_table(coords_u32, interpret=interpret)
    digits = CV.decompose_scalars_signed(scalars_u32, cfg)           # [n, W]
    return table, digits.T                                           # [W, n]


@aot_jit(static_argnames=("nb", "wg", "interpret"))
def _stage_group(table, digits_t, g, nb: int, wg: int, interpret: bool | None):
    """One window group's bucket sums.  The group's digit rows are sliced out
    of the full [W, n] digit array INSIDE the program (g is a traced scalar),
    so per-group dispatch is exactly one program launch — a host-side
    `digits_t[g*wg:(g+1)*wg]` slice is itself a separate compiled dispatch
    (~1-3 ms of host/tunnel issue time each at 2^20)."""
    digits_g = lax.dynamic_slice_in_dim(digits_t, g * wg, wg, axis=0)
    return window_group_bucket_sums(table, digits_g, nb, interpret=interpret)


@aot_jit(static_argnames=("w", "interpret"))
def _stage_bpr(group_rows, w: int, interpret: bool | None):
    """group_rows: tuple of [wg*nb, TW] bucket arrays (one per window group);
    concatenated inside the program to save a dispatch."""
    buckets = group_rows[0] if len(group_rows) == 1 else jnp.concatenate(group_rows, axis=0)
    return PB.bpr(buckets, w, interpret=interpret)


@aot_jit(static_argnames=("w", "cbits", "interpret"))
def _stage_bpr_total(group_rows, w: int, cbits: int, interpret: bool | None):
    """BPR + device Horner fold in one program: [1, TW] packed projective
    total.  Retires the per-MSM host bigint Horner (reference analogue:
    submission.ts:400-407 runs Horner on the CPU too; on this rig the host
    loop plus the extra readback cost ~10 ms/MSM)."""
    buckets = group_rows[0] if len(group_rows) == 1 else jnp.concatenate(group_rows, axis=0)
    sums = PB.bpr(buckets, w, interpret=interpret)
    return PB.horner_fold(sums, cbits, interpret=interpret)


#: Strictly below this size the whole pipeline runs as ONE compiled program:
#: the staged split's extra dispatches cost ~2-4 ms (measured 50.2 -> 47.9 ms
#: at 2^12) while small-shape compiles are cheap (~20-40 s).  At 2^16+ the
#: two are within noise and the split's compile savings win (1025 s ->
#: ~150 s at 2^20).
_MONOLITHIC_MAX_N = 1 << 16


@aot_jit(static_argnames=("chunk_size", "interpret"))
def _mono_pipeline(coords_u32, scalars_u32, chunk_size: int, interpret: bool | None):
    return msm_window_sums(coords_u32, scalars_u32,
                           MsmConfig(chunk_size=chunk_size), interpret=interpret)


@aot_jit(static_argnames=("chunk_size", "interpret"))
def _mono_pipeline_total(coords_u32, scalars_u32, chunk_size: int,
                         interpret: bool | None):
    sums = msm_window_sums(coords_u32, scalars_u32,
                           MsmConfig(chunk_size=chunk_size), interpret=interpret)
    return PB.horner_fold(sums, chunk_size, interpret=interpret)


#: Shape classes already warm-compiled (see warmup_staged).
_WARMED: set = set()


def warmup_staged(
    n: int,
    cfg: MsmConfig,
    window_group: int = 0,
    interpret: bool | None = None,
    fold: bool = True,
) -> float:
    """Compile the staged pipeline's programs for shape class (n, cfg) in
    PARALLEL threads, using zero-filled arrays of the right shapes.

    The remote compile helper overlaps concurrent compilations from one
    process (experiments/parallel_compile_probe2.py: two ~30 s stage
    compiles finish in 38.5 s wall instead of ~60 s serial; two PROCESSES
    would wedge it, threads do not), so the cold start pays ~max of the
    stage compile times instead of their sum.  Returns seconds spent.
    The reference's analogue is the driver-side shader cache warm-up
    (shader_manager.ts:85-92); XLA compile is this framework's shader
    compile.  No-op for already-warm shape classes and under interpret."""
    import threading
    import time as _time

    from .pallas.common import interpret_default

    if interpret_default(interpret):
        return 0.0
    w = cfg.num_windows
    nb = cfg.num_buckets
    if n >= _MONOLITHIC_MAX_N and window_group == 0:
        window_group = default_window_group(n, w)
    key = (n, cfg.chunk_size, window_group, fold, _SINGLE_TABLE, _SCAN_LAYOUT,
           _SCAN_QSTORE)
    if key in _WARMED:
        return 0.0
    t0 = _time.time()
    coords = jnp.zeros((n, 2, 8), jnp.uint32)
    sc = jnp.zeros((n, 8), jnp.uint32)
    if n < _MONOLITHIC_MAX_N and window_group == 0:
        # Single program below the staged threshold — nothing to overlap.
        fn = _mono_pipeline_total if fold else _mono_pipeline
        fn(coords, sc, chunk_size=cfg.chunk_size, interpret=interpret)
        _WARMED.add(key)
        return _time.time() - t0
    groups = w // window_group
    tf = 1 if _SINGLE_TABLE else 2
    table = jnp.zeros((tf * n, PS.TWR), jnp.uint32)
    digits_t = jnp.zeros((w, n), jnp.int32)
    rows = tuple(jnp.zeros((window_group * nb, TW), jnp.uint32)
                 for _ in range(groups))

    def run_table():
        _stage_table_digits(coords, sc, chunk_size=cfg.chunk_size,
                            interpret=interpret)

    def run_group():
        _stage_group(table, digits_t, np.int32(0), nb=nb, wg=window_group,
                     interpret=interpret)

    def run_bpr():
        if fold:
            _stage_bpr_total(rows, w=w, cbits=cfg.chunk_size, interpret=interpret)
        else:
            _stage_bpr(rows, w=w, interpret=interpret)

    threads = [threading.Thread(target=t) for t in (run_table, run_group, run_bpr)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    _WARMED.add(key)
    return _time.time() - t0


def msm_window_sums_staged(
    coords_u32: jnp.ndarray,
    scalars_u32: jnp.ndarray,
    cfg: MsmConfig,
    window_group: int = 0,
    interpret: bool | None = None,
    _force_staged: bool = False,
    fold: bool = False,
) -> jnp.ndarray:
    """Staged production path: identical result to :func:`msm_window_sums`,
    executed as (convert+decompose) -> per-window-group program (compiled
    once, dispatched `groups` times) -> BPR.  Small inputs run monolithic
    (see _MONOLITHIC_MAX_N); _force_staged is for equivalence tests.
    With fold=True the BPR program also runs the device Horner fold and the
    result is the [1, TW] packed projective total instead of [W, TW] window
    sums."""
    n = coords_u32.shape[0]
    assert n % K == 0, f"n={n} must be a multiple of the scan fragment size {K}"
    if n < _MONOLITHIC_MAX_N and window_group == 0 and not _force_staged:
        if fold:
            return _mono_pipeline_total(coords_u32, scalars_u32,
                                        chunk_size=cfg.chunk_size, interpret=interpret)
        return _mono_pipeline(coords_u32, scalars_u32, chunk_size=cfg.chunk_size, interpret=interpret)
    w = cfg.num_windows
    nb = cfg.num_buckets
    if window_group == 0:
        window_group = default_window_group(n, w)
    assert w % window_group == 0
    groups = w // window_group

    # First call per shape class: compile the stage programs in parallel
    # threads (~max instead of sum of compile times; see warmup_staged).
    warmup_staged(n, cfg, window_group=window_group, interpret=interpret,
                  fold=fold)

    table, digits_t = _stage_table_digits(
        coords_u32, scalars_u32, chunk_size=cfg.chunk_size, interpret=interpret
    )
    group_rows = tuple(
        _stage_group(table, digits_t, np.int32(g), nb=nb, wg=window_group,
                     interpret=interpret)
        for g in range(groups)
    )
    if fold:
        return _stage_bpr_total(group_rows, w=w, cbits=cfg.chunk_size,
                                interpret=interpret)                             # [1, TW]
    return _stage_bpr(group_rows, w=w, interpret=interpret)                      # [W, TW]


@aot_jit(static_argnames=("chunk_size", "interpret"))
def _stage_digits_only(scalars_u32, chunk_size: int, interpret: bool | None):
    cfg = MsmConfig(chunk_size=chunk_size)
    return CV.decompose_scalars_signed(scalars_u32, cfg).T           # [W, n]


def msm_window_sums_batch(
    coords_u32: jnp.ndarray,
    scalars_u32_list,
    cfg: MsmConfig,
    window_group: int = 0,
    interpret: bool | None = None,
    fold: bool = False,
    block: int = 0,
) -> list:
    """Batched MSMs over ONE point set and many scalar vectors — the
    production-proving pattern (a fixed SRS, one MSM per committed
    polynomial).  The doubled Montgomery table is built once and reused by
    every MSM; all per-MSM dispatches are issued asynchronously, so device
    work pipelines back-to-back.  Returns a list of [W, TW] packed
    window-sum arrays (fetch them after issuing everything), or [1, TW]
    packed projective totals with fold=True (device Horner — keeps the
    per-MSM host work to one point decode).

    Beyond the device-memory envelope (block=0 derives the same block size
    as :func:`msm_window_sums_blocked`), the point axis streams in blocks:
    each block's table is converted ONCE and reused by all k MSMs before
    moving on — k streaming one-shot calls would rebuild every block's
    table k times (VERDICT r4 #4; reference scale-cap analogue:
    README.md:539-551 — its batch story tops out at one 2^20 MSM at a time).

    The reference has no batch entry point (one compute_msm per call,
    submission.ts:73); this is a new capability enabled by the staged
    pipeline."""
    n = coords_u32.shape[0]
    assert n % K == 0, f"n={n} must be a multiple of the scan fragment size {K}"
    if block == 0:
        block = default_block_size(n)
    if n > block:
        return _msm_window_sums_batch_blocked(
            coords_u32, scalars_u32_list, cfg, block=block,
            window_group=window_group, interpret=interpret, fold=fold)
    w = cfg.num_windows
    nb = cfg.num_buckets
    if window_group == 0:
        window_group = default_window_group(n, w)
    assert w % window_group == 0
    groups = w // window_group

    table = _stage_table(coords_u32, interpret=interpret)
    outs = []
    for sc in scalars_u32_list:
        digits_t = _stage_digits_only(sc, chunk_size=cfg.chunk_size, interpret=interpret)
        group_rows = tuple(
            _stage_group(table, digits_t, np.int32(g), nb=nb, wg=window_group,
                         interpret=interpret)
            for g in range(groups)
        )
        if fold:
            outs.append(_stage_bpr_total(group_rows, w=w, cbits=cfg.chunk_size,
                                         interpret=interpret))
        else:
            outs.append(_stage_bpr(group_rows, w=w, interpret=interpret))
    return outs


def _msm_window_sums_batch_blocked(
    coords_u32: jnp.ndarray,
    scalars_u32_list,
    cfg: MsmConfig,
    block: int,
    window_group: int = 0,
    interpret: bool | None = None,
    fold: bool = False,
) -> list:
    """Streaming batch: block the point axis (tables beyond device memory),
    convert each block's table ONCE, run all k MSMs' window sums for that
    block, EC-accumulate per MSM across blocks.  Identical results to the
    unblocked batch (window sums over disjoint point subsets add)."""
    n = coords_u32.shape[0]
    while n % block != 0 and block > K:
        block //= 2                       # n is a multiple of 4096 (padded)
    assert n % block == 0, (
        f"n={n} must be a multiple of the block size {block} "
        "(compute_msm_batch pads with zero scalars)"
    )
    w = cfg.num_windows
    nb = cfg.num_buckets
    if window_group == 0:
        window_group = default_window_group(block, w)
    assert w % window_group == 0
    groups = w // window_group
    accs = [None] * len(scalars_u32_list)
    for b0 in range(0, n, block):
        table = _stage_table(coords_u32[b0:b0 + block], interpret=interpret)
        for i, sc in enumerate(scalars_u32_list):
            digits_t = _stage_digits_only(sc[b0:b0 + block],
                                          chunk_size=cfg.chunk_size,
                                          interpret=interpret)
            group_rows = tuple(
                _stage_group(table, digits_t, np.int32(g), nb=nb,
                             wg=window_group, interpret=interpret)
                for g in range(groups)
            )
            rows = _stage_bpr(group_rows, w=w, interpret=interpret)
            accs[i] = rows if accs[i] is None else _stage_combine(
                accs[i], rows, interpret=interpret)
    if fold:
        return [_stage_fold(a, cbits=cfg.chunk_size, interpret=interpret)
                for a in accs]
    return accs


@aot_jit(static_argnames=("interpret",))
def _stage_table(coords_u32, interpret: bool | None):
    return build_prod_table(coords_u32, interpret=interpret)


# ---------------------------------------------------------------------------
# Blocked (streaming) path for n beyond the device-memory envelope.


@aot_jit(static_argnames=("interpret",))
def _stage_combine(acc_rows, rows, interpret: bool | None):
    """EC-add two [W, TW] packed window-sum arrays row-wise."""
    ones = jnp.ones((acc_rows.shape[0],), jnp.int32)
    return masked_add_rows(acc_rows, rows, ones, interpret=interpret)


@aot_jit(static_argnames=("cbits", "interpret"))
def _stage_fold(rows, cbits: int, interpret: bool | None):
    return PB.horner_fold(rows, cbits, interpret=interpret)


def default_block_size(n: int) -> int:
    """Largest power-of-two point-block (>= 4096) whose doubled table stays
    under ~40% of device memory, leaving the rest for the per-group staging.
    Above it, `msm_window_sums_blocked` streams blocks through the staged
    pipeline (MSMs over disjoint point subsets add)."""
    from ..utils.runtime import device_memory_bytes

    tf = 1 if _SINGLE_TABLE else 2
    cap_rows = int(0.4 * device_memory_bytes()) // (tf * PS.TWR * 4)
    b = 4096
    while b * 2 <= cap_rows and b * 2 <= n:
        b *= 2
    return b


def msm_window_sums_blocked(
    coords_u32: jnp.ndarray,
    scalars_u32: jnp.ndarray,
    cfg: MsmConfig,
    block: int = 0,
    window_group: int = 0,
    interpret: bool | None = None,
    fold: bool = False,
) -> jnp.ndarray:
    """Streaming large-n MSM: split the point axis into blocks, run the staged
    pipeline per block (same window layout), and EC-add the [W, TW] window
    sums across blocks — sums over disjoint point subsets add, so the result
    is bit-identical to the unblocked pipeline.  Enables n where the doubled
    table alone would not fit device memory (2^23+ on a 16 GB chip); the
    reference is capped at 2^20 by browser buffer limits
    (reference: README.md:539-551 — scale limits are future work there).

    block=0 derives the block size from device memory; blocks must be
    multiples of 4096 (the Pallas pipeline's padding unit)."""
    n = coords_u32.shape[0]
    if block == 0:
        block = default_block_size(n)
    assert block % K == 0, block       # the staged pipeline's own granularity
    if n <= block:
        return msm_window_sums_staged(coords_u32, scalars_u32, cfg,
                                      window_group=window_group,
                                      interpret=interpret, fold=fold)
    while n % block != 0 and block > K:
        block //= 2                       # n is a multiple of 4096 (padded)
    assert n % block == 0, (
        f"n={n} must be a multiple of the block size {block} "
        "(compute_msm pads with zero scalars)"
    )
    acc = None
    for b0 in range(0, n, block):
        rows = msm_window_sums_staged(
            coords_u32[b0:b0 + block], scalars_u32[b0:b0 + block], cfg,
            window_group=window_group, interpret=interpret, fold=False,
        )
        acc = rows if acc is None else _stage_combine(acc, rows, interpret=interpret)
    if fold:
        return _stage_fold(acc, cbits=cfg.chunk_size, interpret=interpret)
    return acc
