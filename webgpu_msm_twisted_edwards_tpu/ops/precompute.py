"""Fixed-base (precomputed-SRS) MSM: the merged single-window pipeline.

Production proving systems run many MSMs against ONE fixed point set (the
SRS).  This module precomputes, once per SRS, the window-shifted point set

    Q[j*n + i] = 2^(c*j) * P[i]        j = 0..W'-1  (window-major)

so that every subsequent MSM becomes a SINGLE merged window: entry (i, j)
contributes digit_j(k_i) * Q[j*n+i], and all W'*n entries share one bucket
space of 2^(c-1) signed buckets — the per-bucket machinery is paid once per
MSM instead of once per window, and the 253-bit decomposition (scalars are
reduced below the subgroup order; the W'*c >= 253 carry-safety bound, see
MsmConfig.scalar_bits) drops a whole window for c in 17..21.

MEASURED OUTCOME (round 4, v5e — the full numbers are in
docs/MEASUREMENTS.md "Fixed-base merged single-window mode"): the mode is
correct (oracle MATCH at every size tested) but ~1.4x SLOWER per MSM than
plain compute_msm_batch at 2^18 (174.3 vs 121.8 ms/MSM).  The shared bucket
space requires ONE global sort of all W'*n entries, and `lax.sort`
parallelizes across rows — a single [1, 4.2M] row costs 9.4x more per
element than the same entries as per-window rows.  A counting argument
closes the repair: splitting the merged entries into R independently-sorted
rows restores sort speed but pays R*nb in per-row extraction or
partial-bucket combines — exactly the per-window cost the merge was meant
to amortize.  Kept as a verified, benchmarked capability (the reference
keeps its rejected experiments the same way) and as the home of reusable
device components: the batched doubling chain (ops/pallas/ec.py::
double_rows), the in-kernel Fermat batch normalization (normalize_rows),
and the field inverses (ops/field.py::mont_inv/_batch).

The HBM tradeoff: the merged table is W' times the one-shot table — it uses
the single-table layout (digit sign applied in-kernel, ops/pallas/scan.py::
msm_scan_rm_signed) to halve that, e.g. c=16 at n=2^20: 16 * 2^20 * 512 B =
8.6 GB (vs 1.1 GB doubled one-shot).  Entry blocks stream through the
bucket-sum program when the working set exceeds device memory; partial
bucket arrays over disjoint entry blocks EC-add.

The reference has no precomputed mode (one-shot compute_msm only,
reference: src/submission/submission.ts:73-78); this explored beyond parity
(VERDICT r3 next-round #4).
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
from . import field as F
from .msm_pipeline import window_group_bucket_sums
from .pallas import bpr as PB
from .pallas import convert as PC
from .pallas import ec as EC
from .pallas import scan as PS
from .pallas.common import LP as _LP
from .pallas.ec import masked_add_rows

L = PARAMS.num_words

#: Merged-window entry-block granularity: the bucket-sum program pads its
#: flattened entry count to a multiple of K*128 fragments (msm_pipeline.py),
#: so blocks are sized in these units.
_BLK_UNIT = PS.K * 128


def fixed_base_config(n: int) -> MsmConfig:
    """Merged-window sizing: c=16 keeps the MXU one-hot histogram cheap
    (entries x 2^15 MACs) and minimizes entries*sort cost among the
    configurations measured; 253-bit coverage (scalars reduced below the
    subgroup order).  See the module docstring for the measured outcome."""
    return MsmConfig(chunk_size=16, scalar_bits=253)


# ---------------------------------------------------------------------------
# Offline precompute: the window-shifted point set.


def _pack_limb_cols(a: jnp.ndarray) -> jnp.ndarray:
    """[n, L] limbs -> [n, LP] packed 2-per-u32 (kernel row format)."""
    return a[:, 0::2] | (a[:, 1::2] << 16)


def _unpack_limb_cols(a: jnp.ndarray) -> jnp.ndarray:
    """[n, LP] packed -> [n, L] limbs."""
    lo = a & jnp.uint32(0xFFFF)
    hi = a >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=-1).reshape(a.shape[0], -1)


_ROW_W = 64   # packed (x,y,t,z) row width (4*LP=40 data cols, tile-padded)


@aot_jit(static_argnames=())
def _to_mont_rows(coords_u32):
    """[n, 2, 8] affine words -> [n, 64] packed Montgomery (x,y,t,z) rows."""
    xm, ym, tm = CV.points_to_mont_limbs(coords_u32)
    z = jnp.broadcast_to(F.r_limbs(), xm.shape)
    n = coords_u32.shape[0]
    rows = jnp.concatenate(
        [_pack_limb_cols(v) for v in (xm, ym, tm, z)], axis=1)
    return jnp.concatenate(
        [rows, jnp.zeros((n, _ROW_W - 4 * _LP), jnp.uint32)], axis=1)


@aot_jit(static_argnames=("times", "interpret"))
def _double_rows_stage(rows, times: int, interpret: bool | None):
    return EC.double_rows(rows, times, interpret=interpret)


def _inv_norm_kernel(lblk, nbits, consts_ref, bits_ref, in_ref, o_ref):
    """Batched affine normalization: per lane, zinv = z^(p-2) by MSB-first
    square-and-multiply (the exponent bits arrive in SMEM, the loop is a
    fori so the graph stays one body), then x*zinv, y*zinv.  ~2*253+2
    Montgomery products per point, all lane-parallel."""
    from .pallas.common import load_consts, mont_mul, pack2, unpack2

    c = load_consts(consts_ref)
    rows = jnp.transpose(in_ref[:])                       # [64, lblk]
    x = unpack2(rows[0 * _LP:1 * _LP])
    y = unpack2(rows[1 * _LP:2 * _LP])
    z = unpack2(rows[3 * _LP:4 * _LP])
    acc0 = jnp.broadcast_to(c.r, z.shape)

    def body(i, acc):
        acc = mont_mul(acc, acc, c.p)
        taken = mont_mul(acc, z, c.p)
        return jnp.where(bits_ref[0, i] != 0, taken, acc)

    zinv = jax.lax.fori_loop(0, nbits, body, acc0)
    xa = mont_mul(x, zinv, c.p)
    ya = mont_mul(y, zinv, c.p)
    pad = jnp.zeros((_ROW_W - 2 * _LP, lblk), jnp.uint32)
    o_ref[:, :] = jnp.transpose(
        jnp.concatenate([pack2(xa), pack2(ya), pad], axis=0))


def _exp_bits_msb() -> np.ndarray:
    e = PARAMS.p - 2
    nbits = e.bit_length()
    bits = [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)]
    out = np.zeros((1, 256), np.int32)
    out[0, :nbits] = bits
    return out


def normalize_rows(rows: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """[n, 64] packed projective Montgomery rows -> [n, 64] rows whose first
    two coordinate slots hold affine x*R, y*R (Fermat inversion in-kernel;
    ~0.5 k products/point at the batched Pallas rate — the XLA-mirror
    associative-scan batch inversion compiled for many minutes on the
    congested remote helper, while this kernel's graph is one loop body)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas.common import interpret_default, make_consts_array

    n, tw = rows.shape
    assert tw == _ROW_W, rows.shape
    orig_n = n
    if n % 128 != 0:
        pad = 128 - n % 128
        rows = jnp.concatenate([rows, jnp.zeros((pad, tw), rows.dtype)])
        n += pad
    lblk = 128
    nbits = (PARAMS.p - 2).bit_length()
    consts = jnp.asarray(make_consts_array())
    bits = jnp.asarray(_exp_bits_msb())
    kern = lambda *refs: _inv_norm_kernel(lblk, nbits, *refs)
    out = pl.pallas_call(
        kern,
        grid=(n // lblk,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((lblk, tw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lblk, tw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tw), jnp.uint32),
        interpret=interpret_default(interpret),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(consts, bits, rows)
    return out[:orig_n]


@aot_jit(static_argnames=("interpret",))
def _normalize_rows_to_coords(rows, interpret: bool | None = None):
    """[n, 64] packed projective rows -> standard-form affine [n, 2, 8] u32
    words: in-kernel Fermat inversion + x/y scaling (normalize_rows), then
    the cheap un-Montgomery + word repack on the XLA path."""
    norm = normalize_rows(rows, interpret=interpret)
    xa = _unpack_limb_cols(norm[:, 0 * _LP:1 * _LP])
    ya = _unpack_limb_cols(norm[:, 1 * _LP:2 * _LP])
    xs = F.from_mont(xa)
    ys = F.from_mont(ya)
    return jnp.stack(
        [CV.limbs_to_u32_words(xs), CV.limbs_to_u32_words(ys)], axis=1
    )


def shifted_base_coords(coords_u32: jnp.ndarray, cfg: MsmConfig,
                        interpret: bool | None = None) -> jnp.ndarray:
    """[n, 2, 8] affine coords -> [W'*n, 2, 8] window-major shifted coords
    (window j block holds 2^(c*j) * P_i), entirely on device.

    The doubling chain — ~253 doublings over the whole point set regardless
    of c, ~8 Montgomery products each — runs in the batched Pallas kernel
    (ops/pallas/ec.py::double_rows, ~950 M mont/s) on packed coordinate
    rows; each window then normalizes to affine with ONE batched inversion
    (~6 multiplies/point, F.mont_inv_batch) plus the un-Montgomery pass on
    the XLA path."""
    w = cfg.num_windows
    out = [jnp.asarray(coords_u32)]
    rows = _to_mont_rows(out[0])
    for _ in range(w - 1):
        rows = _double_rows_stage(rows, times=cfg.chunk_size,
                                  interpret=interpret)
        out.append(_normalize_rows_to_coords(rows, interpret=interpret))
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
    merged = shifted_base_coords(jnp.asarray(coords_u32), cfg, interpret=interpret)
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
    for fn in (_double_rows_stage, _normalize_rows_to_coords, _to_mont_rows,
               _stage_merged_table, _stage_merged_digits,
               _stage_merged_block, _stage_merged_accum,
               _stage_merged_total):
        fn.clear_cache()
