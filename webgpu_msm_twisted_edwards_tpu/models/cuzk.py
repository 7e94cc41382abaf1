"""The flagship MSM engine: the full cuZK-style pipeline as one jitted XLA
program per (n, window-size) shape class.

TPU re-design of the reference orchestrator
(reference: src/submission/submission.ts:73-412 `compute_msm`):

    stage 1  convert + decompose   (ops.convert)     — batch kernel over points
    stage 2  transpose             (ops.buckets.sort_buckets, lax.sort based)
    stage 3  SMVP                  (ops.buckets.accumulate_buckets)
    stage 4  BPR                   (ops.bpr.reduce_buckets)
    host     un-Montgomery + Horner + to-affine      (cpu reference layer)

The device program returns only the 16 per-window sums (a few KB), matching
the reference's design principle of writing inputs once and reading back only
the reduced result (reference: README.md:99-102, submission.ts:351-412).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cpu.curve import ExtPoint
from ..cpu.mirrors import horner
from ..ops import bpr as BPR
from ..ops import buckets as B
from ..ops import convert as CV
from ..ops import curve as C
from ..utils import limbs as L
from ..utils.params import (
    PARAMS,
    SUBGROUP_ORDER,
    MsmConfig,
    default_msm_config,
    tpu_msm_config,
)


def msm_window_sums_device(
    coords_u32: jnp.ndarray,
    scalars_u32: jnp.ndarray,
    cfg: MsmConfig,
    bpr_chunks: int = 256,
) -> C.PointXYTZ:
    """Device pipeline: [n,2,8], [n,8] uint32 -> [W] window-sum points in
    Montgomery-form limbs.  Pure function of its inputs; jit-safe."""
    params = PARAMS
    xm, ym, tm = CV.points_to_mont_limbs(coords_u32, params)
    n = coords_u32.shape[0]
    z = jnp.broadcast_to(jnp.asarray(_r_limbs_np()), (n, params.num_words))
    points = C.PointXYTZ(xm, ym, tm, z)

    digits = CV.decompose_scalars_signed(scalars_u32, cfg)
    sb = B.sort_buckets(digits, cfg)
    buckets = B.accumulate_buckets(points, sb, params)
    return BPR.reduce_buckets(buckets, num_chunks=bpr_chunks, params=params)


def _r_limbs_np():
    params = PARAMS
    out = np.empty(params.num_words, dtype=np.uint32)
    for i in range(params.num_words):
        out[i] = (params.r >> (i * params.word_size)) & params.mask
    return out


@lru_cache(maxsize=None)
def _jitted_pipeline(chunk_size: int, bpr_chunks: int):
    cfg = MsmConfig(chunk_size=chunk_size)
    fn = partial(msm_window_sums_device, cfg=cfg, bpr_chunks=bpr_chunks)
    return jax.jit(fn)


def window_sums_to_extpoints(sums: C.PointXYTZ) -> list[ExtPoint]:
    """Read back [W] Montgomery-limb window sums and convert to python-int
    extended points (un-Montgomery on host; reference: submission.ts:363-393)."""
    params = PARAMS
    arrs = [np.asarray(sums.x), np.asarray(sums.y), np.asarray(sums.t), np.asarray(sums.z)]
    out = []
    w = arrs[0].shape[0]
    for i in range(w):
        x, y, t, z = (L.words_le_to_int(a[i], params.word_size) for a in arrs)
        out.append(
            ExtPoint(
                params.from_mont(x),
                params.from_mont(y),
                params.from_mont(t),
                params.from_mont(z),
            )
        )
    return out


def prepare_inputs(
    points: Sequence[tuple[int, int]] | np.ndarray,
    scalars: Sequence[int] | np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side packing into the device input layout: affine points ->
    [n, 2, 8] uint32 LE words; scalars -> [n, 8] uint32 LE words.

    The analogue of the reference's input buffers
    (reference: submission.ts:444-462; bigIntsToBufferLE layout,
    src/reference/webgpu/utils.ts:90-103).  Points may be (x, y) tuples,
    BigIntPoint-style dicts with "x"/"y" keys (reference:
    src/reference/types.ts:1-6), or a pre-packed [n, 2, 8] uint32 array."""
    if _is_packed_u32(points):
        coords = points                 # host- or device-resident, pre-packed
    else:
        pts = [(p["x"], p["y"]) if isinstance(p, dict) else p for p in points]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        coords = np.stack([L.ints_to_u32_words(xs), L.ints_to_u32_words(ys)], axis=1)
    if _is_packed_u32(scalars):
        sc = scalars
    else:
        sc = L.ints_to_u32_words(list(scalars))
    return coords, reduce_scalars_mod_order(sc)


def _is_packed_u32(arr) -> bool:
    """True for pre-packed uint32 input arrays — host numpy or DEVICE-RESIDENT
    jax arrays.  Device-resident inputs are first-class (the production
    pattern: a proving system already holds the SRS and witness scalars in
    HBM, and re-staging 64 MB of coordinates per MSM would dominate)."""
    if isinstance(arr, np.ndarray):
        return arr.dtype == np.uint32
    return isinstance(arr, jax.Array) and arr.dtype == jnp.uint32


@jax.jit
def _any_scalar_ge_order(sc: jnp.ndarray) -> bool:
    """Device-side guard check for device-resident scalars: one jitted
    lexicographic compare, one scalar fetched.  Module-level jit — a fresh
    jax.jit wrapper per call would RECOMPILE this tiny program every MSM
    (~350 ms on the remote compile helper, measured via `benchmarks batch
    --resident`)."""
    order_words = jnp.asarray(L.ints_to_u32_words([SUBGROUP_ORDER])[0])
    ge = jnp.ones(sc.shape[0], bool)
    gt = jnp.zeros(sc.shape[0], bool)
    for i in range(sc.shape[1] - 1, -1, -1):
        gt = gt | (ge & (sc[:, i] > order_words[i]))
        ge = ge & (sc[:, i] == order_words[i])
    return jnp.any(gt | ge)


def reduce_scalars_mod_order(sc) -> np.ndarray:
    """Scalar-domain guard: reduce any scalar >= the subgroup order mod that
    order (for subgroup points, k*P == (k mod order)*P, so the result is
    unchanged — but the signed window decomposition would silently drop its
    final carry for scalars >= ~2^255 and return a wrong answer).

    The reference instead throws on the final carry
    (reference: src/submission/miscellaneous/utils.ts:81-84); reducing keeps
    the full 256-bit input domain valid.  sc: [n, 8] uint32 LE words — host
    numpy, or device-resident (checked with one jitted device compare; only
    the rare oversized case pulls the array to the host)."""
    if isinstance(sc, jax.Array) and not isinstance(sc, np.ndarray):
        if not bool(_any_scalar_ge_order(sc)):
            return sc
        sc = np.asarray(sc)
    order_words = L.ints_to_u32_words([SUBGROUP_ORDER])[0]
    # Vectorized lexicographic compare, most-significant word first.
    ge = np.ones(sc.shape[0], dtype=bool)   # tracks "equal so far" -> ">= order"
    gt = np.zeros(sc.shape[0], dtype=bool)
    for i in range(sc.shape[1] - 1, -1, -1):
        gt |= ge & (sc[:, i] > order_words[i])
        ge &= sc[:, i] == order_words[i]
    bad = gt | ge
    if not bad.any():
        return sc
    sc = sc.copy()
    for row in np.flatnonzero(bad):
        v = L.words_le_to_int(sc[row].astype(np.uint64), 32) % SUBGROUP_ORDER
        sc[row] = L.ints_to_u32_words([v])[0]
    return sc


def _pad_points(coords, pad: int):
    """Append `pad` copies of row 0 (any valid point; its digits are zero).
    Uses jnp for device-resident inputs so padding stays on device."""
    xp = jnp if isinstance(coords, jax.Array) and not isinstance(coords, np.ndarray) else np
    return xp.concatenate([coords, xp.tile(coords[:1], (pad, 1, 1))], axis=0)


def _pad_zero_scalars(sc, pad: int):
    xp = jnp if isinstance(sc, jax.Array) and not isinstance(sc, np.ndarray) else np
    return xp.concatenate([sc, xp.zeros((pad, 8), xp.uint32)], axis=0)


def packed_rows_to_extpoints(rows: np.ndarray) -> list[ExtPoint]:
    """[W, TW] packed (x,y,t,z) rows -> python-int extended points
    (un-Montgomery on host; reference: submission.ts:363-393)."""
    from ..ops.pallas.common import LP, W as WBITS

    params = PARAMS
    out = []
    for r in rows:
        coords = []
        for ci in range(4):
            pk = r[ci * LP:(ci + 1) * LP]
            v = 0
            for i, u in enumerate(pk):
                v |= (int(u) & 0xFFFF) << (2 * i * WBITS)
                v |= (int(u) >> 16) << ((2 * i + 1) * WBITS)
            coords.append(params.from_mont(v % params.p))
        out.append(ExtPoint(*coords))
    return out


def _clear_pallas_pipeline_caches():
    """Drop the staged pipeline's compiled programs (force_recompile)."""
    from ..ops import msm_pipeline as MP
    from ..ops import precompute as PRE

    for fn in (MP._stage_table_digits, MP._stage_group, MP._stage_bpr,
               MP._stage_bpr_total, MP._stage_table, MP._stage_digits_only,
               MP._mono_pipeline, MP._mono_pipeline_total,
               MP._stage_combine, MP._stage_fold):
        fn.clear_cache()
    MP._WARMED.clear()
    PRE.clear_caches()


def compute_msm(
    points: Sequence[tuple[int, int]] | np.ndarray,
    scalars: Sequence[int] | np.ndarray,
    log_result: bool = False,
    force_recompile: bool = False,
    chunk_size: int | None = None,
    bpr_chunks: int = 256,
    use_pallas: bool | None = None,
    interpret: bool | None = None,
) -> dict[str, int]:
    """End-to-end MSM: returns the affine result {x, y} as python ints.

    API parity with the reference entry point
    `compute_msm(baseAffinePoints, scalars) -> {x, y}`
    (reference: submission.ts:73-78).

    Points are assumed to lie in the prime-order subgroup (as all ZPrize
    fixture points do).  Scalars >= the subgroup order are reduced mod the
    order — correct for subgroup points (k*P == (k mod r)*P) but NOT for
    points with a cofactor component; the reference instead throws on such
    scalars (miscellaneous/utils.ts:81-84).  See `reduce_scalars_mod_order`.

    Two device paths:
    - the production Pallas pipeline (sorted segmented-scan; ops/msm_pipeline)
      for c=16 and n >= 512 — used automatically on TPU;
    - the pure-XLA reference pipeline (kept as the correctness mirror and the
      small-input / c=4 path).
    """
    if force_recompile:
        # Parity with the reference's shader-cache buster
        # (reference: submission.ts:76-77, shader_manager.ts:85-92): drop the
        # cached jitted pipelines so XLA re-traces and re-compiles.
        _jitted_pipeline.cache_clear()
        _clear_pallas_pipeline_caches()
    coords, sc = prepare_inputs(points, scalars)
    n = coords.shape[0]
    if chunk_size is None:
        # Window sizing: the reference drops to c=4 below 2^16
        # (submission.ts:79-83); on TPU the Pallas pipeline makes wide
        # windows profitable from n >= 4096, with the c=13/c=16 split
        # measured in utils.params.tpu_msm_config.
        if jax.default_backend() == "tpu" and n >= 4096:
            cfg = tpu_msm_config(n)
        else:
            cfg = default_msm_config(n)
    else:
        cfg = MsmConfig(chunk_size=chunk_size)
    if use_pallas is None:
        # The Pallas kernels compile only for TPU (interpreter mode elsewhere
        # is orders of magnitude slower than the XLA path) — auto-select only
        # when actually on TPU hardware.
        use_pallas = (
            jax.default_backend() == "tpu" and cfg.chunk_size >= 8 and n >= 512
        )
    if use_pallas:
        # Pad to a multiple of 4096 (>= 4096) with zero scalars: zero digits
        # sort to the sentinel tail and contribute nothing.
        target = max(4096, -(-n // 4096) * 4096)
        if target != n:
            coords = _pad_points(coords, target - n)
            sc = _pad_zero_scalars(sc, target - n)
        from ..ops import msm_pipeline as MP

        # fold=True: the BPR program ends with the device Horner fold, so the
        # readback is ONE projective point and the host does no bigint Horner.
        # msm_window_sums_blocked streams point blocks when n exceeds the
        # device-memory envelope (2^23+ on 16 GB) and falls through to the
        # plain staged pipeline otherwise.
        rows = np.asarray(
            MP.msm_window_sums_blocked(
                jnp.asarray(coords), jnp.asarray(sc), cfg, interpret=interpret,
                fold=True,
            )
        )
        total = packed_rows_to_extpoints(rows)[0]
    else:
        fn = _jitted_pipeline(cfg.chunk_size, bpr_chunks)
        sums = fn(jnp.asarray(coords), jnp.asarray(sc))
        sums = jax.tree_util.tree_map(lambda a: np.asarray(a), sums)
        pts = window_sums_to_extpoints(sums)
        total = horner(pts, cfg.chunk_size)
    x, y = total.to_affine()
    if log_result:
        print({"x": x, "y": y})
    return {"x": x, "y": y}


def compute_msm_batch(
    points: Sequence[tuple[int, int]] | np.ndarray,
    scalars_list: Sequence,
    chunk_size: int | None = None,
    interpret: bool | None = None,
) -> list[dict[str, int]]:
    """Many MSMs over ONE point set (the production-proving pattern: a fixed
    SRS, one MSM per polynomial).  The Montgomery point table is converted
    once and reused; every device dispatch is issued before any result is
    fetched, so the MSMs pipeline back-to-back on the device.

    Returns one {x, y} per scalar vector — element i equals
    compute_msm(points, scalars_list[i]).  (New capability: the reference
    exposes only the one-shot compute_msm, submission.ts:73-78.)

    Same subgroup-point assumption as `compute_msm`: scalars >= the subgroup
    order are reduced mod the order, which is only k*P-preserving for points
    in the prime-order subgroup."""
    import jax

    from ..ops import msm_pipeline as MP

    coords, _ = prepare_inputs(points, [])
    n = coords.shape[0]
    packed = [
        sc if _is_packed_u32(sc) else L.ints_to_u32_words(list(sc))
        for sc in scalars_list
    ]
    if packed and all(
        isinstance(sc, jax.Array) and not isinstance(sc, np.ndarray)
        for sc in packed
    ):
        # Device-resident batch: ONE stacked guard compare for all k vectors
        # (a per-vector bool fetch is a ~30 ms sync each that would serialize
        # the batch's dispatch pipelining).
        if bool(_any_scalar_ge_order(jnp.concatenate(packed, axis=0))):
            scs = [reduce_scalars_mod_order(np.asarray(sc)) for sc in packed]
        else:
            scs = packed
    else:
        scs = [reduce_scalars_mod_order(sc) for sc in packed]
    if chunk_size is None:
        cfg = tpu_msm_config(n) if jax.default_backend() == "tpu" and n >= 4096 else default_msm_config(n)
    else:
        cfg = MsmConfig(chunk_size=chunk_size)
    use_pallas = jax.default_backend() == "tpu" and cfg.chunk_size >= 8 and n >= 512
    if not use_pallas and not interpret:
        # Off-TPU (and not explicitly interpreting): fall back to one-shot
        # calls (still correct).  Covers both interpret=None and an explicit
        # interpret=False, which must not try to compile Pallas off-TPU.
        return [
            compute_msm(coords, sc, chunk_size=cfg.chunk_size) for sc in scs
        ]
    target = max(4096, -(-n // 4096) * 4096)
    if target != n:
        coords = _pad_points(coords, target - n)
        scs = [_pad_zero_scalars(sc, target - n) for sc in scs]
    rows_list = MP.msm_window_sums_batch(
        jnp.asarray(coords), [jnp.asarray(sc) for sc in scs], cfg,
        interpret=interpret, fold=True,
    )
    results = []
    for rows in rows_list:                      # fetch after issuing all
        total = packed_rows_to_extpoints(np.asarray(rows))[0]
        x, y = total.to_affine()
        results.append({"x": x, "y": y})
    return results


def precompute_msm_base(
    points: Sequence[tuple[int, int]] | np.ndarray,
    chunk_size: int | None = None,
    interpret: bool | None = None,
):
    """One-time fixed-base (SRS) precompute for `compute_msm_precomputed`:
    builds the device-resident merged window-shifted table
    Q[j*n+i] = 2^(c*j) * P_i (ops/precompute.py).  Returns an opaque
    PrecomputedBase to pass to every subsequent MSM over these points.

    Beyond-parity capability: the reference re-reads the full point set every
    MSM (reference: submission.ts:73-78); here the per-MSM work drops to the
    scalar-dependent stages only, and the merged single-window layout pays
    the bucket machinery once per MSM instead of once per window."""
    from ..ops import precompute as PRE

    coords, _ = prepare_inputs(points, [])
    n = coords.shape[0]
    target = max(4096, -(-n // 4096) * 4096)
    if target != n:
        coords = _pad_points(coords, target - n)
    cfg = (PRE.fixed_base_config(target) if chunk_size is None
           else MsmConfig(chunk_size=chunk_size, scalar_bits=253))
    return PRE.precompute_fixed_base(jnp.asarray(coords), cfg,
                                     interpret=interpret)


def compute_msm_precomputed(
    pre,
    scalars: Sequence[int] | np.ndarray,
    interpret: bool | None = None,
) -> dict[str, int]:
    """MSM against a precomputed fixed base (see `precompute_msm_base`).
    Result equals compute_msm(points, scalars) bit-for-bit."""
    rows = np.asarray(_fixed_base_rows(pre, scalars, interpret=interpret))
    total = packed_rows_to_extpoints(rows)[0]
    x, y = total.to_affine()
    return {"x": x, "y": y}


def compute_msm_batch_precomputed(
    pre,
    scalars_list: Sequence,
    interpret: bool | None = None,
) -> list[dict[str, int]]:
    """Batched MSMs against a precomputed fixed base: all device work is
    issued before any result is fetched (the production-proving pattern)."""
    rows_list = [_fixed_base_rows(pre, sc, interpret=interpret)
                 for sc in scalars_list]
    results = []
    for rows in rows_list:
        total = packed_rows_to_extpoints(np.asarray(rows))[0]
        x, y = total.to_affine()
        results.append({"x": x, "y": y})
    return results


def _fixed_base_rows(pre, scalars, interpret: bool | None = None):
    """Shared scalar prep + dispatch for the precomputed path: pack, reduce
    mod the subgroup order, pad to the precompute's point count."""
    from ..ops import precompute as PRE

    sc = scalars if _is_packed_u32(scalars) else L.ints_to_u32_words(list(scalars))
    sc = reduce_scalars_mod_order(sc)
    if sc.shape[0] != pre.n:
        assert sc.shape[0] <= pre.n, (sc.shape, pre.n)
        sc = _pad_zero_scalars(sc, pre.n - sc.shape[0])
    return PRE.fixed_base_total_rows(pre, jnp.asarray(sc), interpret=interpret)
