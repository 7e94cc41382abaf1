"""Fixed-base (precomputed-SRS) MSM: the merged single-window pipeline.

Production proving systems run many MSMs against ONE fixed point set (the
SRS).  This module precomputes, once per SRS, the window-shifted point set

    Q[j*n + i] = 2^(c*j) * P[i]        j = 0..W'-1  (window-major)

so that every subsequent MSM becomes a SINGLE merged window: entry (i, j)
contributes digit_j(k_i) * Q[j*n+i], and all W'*n entries share one bucket
space of 2^(c-1) signed buckets.  Two structural effects vs the per-window
pipeline (ops/msm_pipeline.py):

  1. The per-bucket machinery (histogram, extraction glue, BPR, Horner) is
     paid ONCE instead of once per window — at 2^20/c=16 that machinery is
     ~50 ms of the 467 ms budget across 16 windows (docs/DESIGN.md §5).
  2. With the bucket cost amortized, wider windows are profitable earlier:
     scan/gather/sort work is ceil(253/c)*n entries, so raising c from the
     sweep-derived 13 (2^18) or 16 (2^19+) cuts the dominant entry-linear
     costs.  Scalars are reduced below the subgroup order (< 2^251), so the
     decomposition covers 253 bits (the W'*c >= 253 carry-safety bound —
     see MsmConfig.scalar_bits), dropping a whole window for c in 17..21.

The HBM tradeoff: the merged table is W' times the one-shot table — it uses
the single-table layout (digit sign applied in-kernel, ops/pallas/scan.py::
msm_scan_signed) to halve that, e.g. c=16 at n=2^20: 16 * 2^20 * 512 B =
8.6 GB (vs 1.1 GB doubled one-shot).  Entry blocks stream through the
bucket-sum program when the working set exceeds device memory; partial
bucket arrays over disjoint entry blocks EC-add.

The reference has no precomputed mode (one-shot compute_msm only,
reference: src/submission/submission.ts:73-78); this is a beyond-parity
capability (VERDICT r3 next-round #4).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.aot_cache import aot_jit
from ..utils.params import PARAMS, MsmConfig
from . import convert as CV
from . import curve as C
from . import field as F
from .msm_pipeline import TW, window_group_bucket_sums
from .pallas import bpr as PB
from .pallas import convert as PC
from .pallas import scan as PS
from .pallas.ec import masked_add_rows

L = PARAMS.num_words

#: Merged-window entry-block granularity: the bucket-sum program pads its
#: flattened entry count to a multiple of K*128 fragments (msm_pipeline.py),
#: so blocks are sized in these units.
_BLK_UNIT = PS.K * 128


def fixed_base_config(n: int) -> MsmConfig:
    """Merged-window sizing.  c=16 keeps the MXU one-hot histogram cheap
    (entries x 2^15 MACs) and matches the sweep-derived production window at
    2^19+; with the bucket machinery amortized across the whole MSM it also
    beats c=13 at 2^18 (fewer entries: 16 windows vs 20).  253-bit coverage
    (scalars reduced below the subgroup order) — see module docstring."""
    return MsmConfig(chunk_size=16, scalar_bits=253)


# ---------------------------------------------------------------------------
# Offline precompute: the window-shifted point set.


@aot_jit(static_argnames=("times",))
def _double_times(x, y, t, z, times: int):
    """times successive extended-Edwards doublings of a point batch
    ([n, L] Montgomery limb arrays)."""
    p = C.PointXYTZ(x, y, t, z)
    p = lax.fori_loop(0, times, lambda i, q: C.double(q), p)
    return p.x, p.y, p.t, p.z


@aot_jit(static_argnames=())
def _normalize_to_coords(x, y, z):
    """Projective Montgomery [n, L] -> standard-form affine [n, 2, 8] u32
    words, via one batched Montgomery inversion (F.mont_inv_batch)."""
    zinv = F.mont_inv_batch(z)
    xa = F.from_mont(F.mont_mul(x, zinv))
    ya = F.from_mont(F.mont_mul(y, zinv))
    return jnp.stack(
        [CV.limbs_to_u32_words(xa), CV.limbs_to_u32_words(ya)], axis=1
    )


@aot_jit(static_argnames=())
def _to_mont_xytz(coords_u32):
    xm, ym, tm = CV.points_to_mont_limbs(coords_u32)
    z = jnp.broadcast_to(F.r_limbs(), xm.shape)
    return xm, ym, tm, z


def shifted_base_coords(coords_u32: jnp.ndarray, cfg: MsmConfig) -> jnp.ndarray:
    """[n, 2, 8] affine coords -> [W'*n, 2, 8] window-major shifted coords
    (window j block holds 2^(c*j) * P_i), entirely on device.

    The doubling chain runs per window (c doublings of the previous window's
    batch, dbl-2008-hwcd via ops/curve.py) and each window normalizes with
    ONE batched inversion (~6 multiplies/point, F.mont_inv_batch) — the whole
    precompute is ~253 point doublings over n lanes regardless of c."""
    w = cfg.num_windows
    out = [jnp.asarray(coords_u32)]
    p = _to_mont_xytz(out[0])
    for _ in range(w - 1):
        p = _double_times(*p, times=cfg.chunk_size)
        out.append(_normalize_to_coords(p[0], p[1], p[3]))
    return jnp.concatenate(out, axis=0)


# ---------------------------------------------------------------------------
# Per-MSM staged programs (compiled once per shape class, like
# msm_pipeline's staged path).


@aot_jit(static_argnames=("interpret",))
def _stage_merged_table(coords_u32, interpret: bool | None):
    """Merged coords -> single-table cached rows [W'*n, TWR] (sign applied
    in-kernel by the scan; halves the table's HBM vs the doubled layout)."""
    return PC.build_table(coords_u32, interpret=interpret)


@aot_jit(static_argnames=("chunk_size", "scalar_bits", "pad_to", "interpret"))
def _stage_merged_digits(scalars_u32, chunk_size: int, scalar_bits: int,
                         pad_to: int, interpret: bool | None):
    """[n, 8] scalars -> [pad_to] flat window-major signed digits (entry
    j*n+i = digit j of scalar i), zero-padded (sentinel bucket) to the
    entry-block grid."""
    cfg = MsmConfig(chunk_size=chunk_size, scalar_bits=scalar_bits)
    d = CV.decompose_scalars_signed(scalars_u32, cfg).T.reshape(-1)
    if pad_to != d.shape[0]:
        d = jnp.concatenate(
            [d, jnp.zeros((pad_to - d.shape[0],), jnp.int32)]
        )
    return d


@aot_jit(static_argnames=("nb", "nblk", "interpret"))
def _stage_merged_block(table, digits_flat, b, nb: int, nblk: int,
                        interpret: bool | None):
    """Bucket partial sums [nb, TW] for entry block b (a traced scalar: one
    compiled program serves all blocks).  Entry i of the block reads table
    row b*nblk + i; out-of-range padded entries carry digit 0 (sentinel
    bucket) and their clipped gather rows are never extracted."""
    d = lax.dynamic_slice_in_dim(digits_flat, b * nblk, nblk)
    return window_group_bucket_sums(
        table, d[None, :], nb, interpret=interpret, table_base=b * nblk
    )


@aot_jit(static_argnames=("interpret",))
def _stage_merged_accum(acc, part, interpret: bool | None):
    """EC-add two [nb, TW] partial bucket arrays (disjoint entry blocks)."""
    ones = jnp.ones((acc.shape[0],), jnp.int32)
    return masked_add_rows(acc, part, ones, interpret=interpret)


@aot_jit(static_argnames=("interpret",))
def _stage_merged_total(buckets, interpret: bool | None):
    """[nb, TW] merged buckets -> [1, TW] packed projective MSM total (the
    single-window BPR running sum IS the final result — no Horner)."""
    return PB.bpr(buckets, 1, interpret=interpret)


# ---------------------------------------------------------------------------
# Context + driver.


@dataclasses.dataclass
class PrecomputedBase:
    """Device-resident precomputed SRS: the merged single-table rows plus the
    static shape info every per-MSM dispatch needs."""

    table: jax.Array          # [W'*n, TWR] cached rows, window-major
    cfg: MsmConfig            # merged window config (chunk_size, 253 bits)
    n: int                    # padded point count (multiple of 4096)
    nblk: int                 # entries per streamed block
    blocks: int               # number of blocks (nblk*blocks >= W'*n)

    @property
    def n_entries(self) -> int:
        return self.cfg.num_windows * self.n

    @property
    def table_bytes(self) -> int:
        return self.table.size * 4


def default_entry_block(n_entries: int, table_bytes: int) -> tuple[int, int]:
    """(nblk, blocks): smallest block count whose per-block staging (sort,
    gather output, scan output — ~1300 B/entry, msm_pipeline.py:
    _STAGING_BYTES_PER_ENTRY) fits device memory next to the merged table."""
    from ..utils.runtime import device_memory_bytes
    from .msm_pipeline import _STAGING_BYTES_PER_ENTRY

    budget = max(int(0.85 * device_memory_bytes()) - table_bytes,
                 _BLK_UNIT * _STAGING_BYTES_PER_ENTRY)
    cap = max(budget // _STAGING_BYTES_PER_ENTRY, _BLK_UNIT)
    blocks = max(1, -(-n_entries // cap))
    per_block = -(-n_entries // blocks)
    nblk = -(-per_block // _BLK_UNIT) * _BLK_UNIT
    return nblk, -(-n_entries // nblk)


def precompute_fixed_base(
    coords_u32: jnp.ndarray,
    cfg: MsmConfig | None = None,
    interpret: bool | None = None,
) -> PrecomputedBase:
    """Build the device-resident precomputed SRS from padded [n, 2, 8]
    coords (n a multiple of 4096).  One-time cost: ~253 batched point
    doublings + W' batched inversions + the convert kernel over W'*n rows."""
    n = coords_u32.shape[0]
    assert n % PS.K == 0, f"n={n} must be a multiple of {PS.K} (pad first)"
    if cfg is None:
        cfg = fixed_base_config(n)
    from ..utils.runtime import device_memory_bytes

    table_bytes = cfg.num_windows * n * PS.TWR * 4
    if table_bytes > 0.6 * device_memory_bytes():
        raise ValueError(
            f"merged fixed-base table ({table_bytes / 2**30:.1f} GB at "
            f"W'={cfg.num_windows}) exceeds 60% of device memory — the "
            "precomputed mode trades HBM for per-MSM time and tops out "
            "around n=2^20 on a 16 GB chip; use compute_msm_batch for "
            "larger point sets"
        )
    merged = shifted_base_coords(jnp.asarray(coords_u32), cfg)
    table = _stage_merged_table(merged, interpret=interpret)
    nblk, blocks = default_entry_block(cfg.num_windows * n, table.size * 4)
    return PrecomputedBase(table=table, cfg=cfg, n=n, nblk=nblk, blocks=blocks)


def fixed_base_total_rows(
    pre: PrecomputedBase,
    scalars_u32: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One MSM against the precomputed base: [n, 8] scalar words ->
    [1, TW] packed projective total (all dispatches async)."""
    assert scalars_u32.shape[0] == pre.n, (scalars_u32.shape, pre.n)
    nb = pre.cfg.num_buckets
    digits = _stage_merged_digits(
        jnp.asarray(scalars_u32), chunk_size=pre.cfg.chunk_size,
        scalar_bits=pre.cfg.scalar_bits, pad_to=pre.nblk * pre.blocks,
        interpret=interpret,
    )
    acc = None
    for b in range(pre.blocks):
        part = _stage_merged_block(
            pre.table, digits, np.int32(b), nb=nb, nblk=pre.nblk,
            interpret=interpret,
        )
        acc = part if acc is None else _stage_merged_accum(
            acc, part, interpret=interpret
        )
    return _stage_merged_total(acc, interpret=interpret)


def clear_caches() -> None:
    """force_recompile support (models/cuzk.py)."""
    for fn in (_double_times, _normalize_to_coords, _to_mont_xytz,
               _stage_merged_table, _stage_merged_digits,
               _stage_merged_block, _stage_merged_accum,
               _stage_merged_total):
        fn.clear_cache()
