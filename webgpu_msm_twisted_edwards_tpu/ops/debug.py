"""Per-stage debug validators: device intermediates vs CPU mirrors.

Parity with the reference's `debug` flags, which read intermediate GPU
buffers back and assert equality against the CPU mirror of each stage
(reference: src/submission/submission.ts:892-951 stage-1 check vs x*r and
decompose_scalars_signed, :953-991 transpose vs cpu_transpose, :993-1085 SMVP
vs cpu_smvp_signed with rinv conversion, :1087-1363 BPR vs
parallel_bucket_reduction_1/2).

Usage: `validate_pipeline(points, scalars)` raises AssertionError naming the
first stage whose device output disagrees with the python mirror.
"""

from __future__ import annotations

import numpy as np

from ..cpu.curve import ExtPoint
from ..cpu.mirrors import bucket_accumulation_signed, decompose_scalars_signed
from ..utils.params import PARAMS, MsmConfig
from .msm_pipeline import TW


def _unpack_row(row: np.ndarray) -> ExtPoint:
    from ..models.cuzk import packed_rows_to_extpoints

    return packed_rows_to_extpoints(row[None])[0]


def validate_pipeline(points, scalars, chunk_size: int = 16,
                      interpret: bool | None = None) -> dict:
    """Run every device stage and check it against the CPU mirror.  Points are
    (x, y) int pairs; n must satisfy the pipeline's divisibility rules
    (>= 512, multiple of 512).  Returns per-stage status."""
    import jax.numpy as jnp

    from ..models import cuzk
    from . import convert as CV
    from . import msm_pipeline as MP

    cfg = MsmConfig(chunk_size=chunk_size)
    coords, sc = cuzk.prepare_inputs(points, scalars)
    n = coords.shape[0]
    status = {}

    # Stage 1a: signed decomposition (reference check: submission.ts:892-951).
    digits_dev = np.asarray(CV.decompose_scalars_signed(jnp.asarray(sc), cfg))
    scalars_int = [int(s) for s in scalars]
    digits_cpu = np.array(
        decompose_scalars_signed(scalars_int, cfg.num_windows, cfg.chunk_size),
        dtype=np.int32,
    )
    assert (digits_dev == digits_cpu).all(), "stage 1 decompose mismatch"
    status["decompose"] = "ok"

    # Stage 1b: Montgomery conversion table (x*R check, like the reference's
    # field_mul(x, r) assertion).
    table = np.asarray(MP.build_full_table(jnp.asarray(coords), interpret=interpret))
    for i in (0, n // 2, n - 1):
        x, y = points[i] if not isinstance(points, np.ndarray) else (None, None)
        if x is None:
            break
        row = table[i]
        # Table rows hold the cached form y-x, y+x, 2*d*t as unpacked 13-bit
        # limbs (20 u32 each); col 0 checks (y - x)*R.
        dm = sum(int(row[j]) << (j * PARAMS.word_size) for j in range(PARAMS.num_words))
        assert dm % PARAMS.p == PARAMS.to_mont((y - x) % PARAMS.p), (
            f"stage 1 convert mismatch at {i}"
        )
    status["convert"] = "ok"

    # Stages 2+3: bucket sums vs the CPU mirror (reference: :993-1085).
    pts_cpu = [ExtPoint.from_affine(x, y) for x, y in points]
    want_buckets = bucket_accumulation_signed(
        pts_cpu, digits_cpu.tolist(), cfg.num_windows, cfg.chunk_size
    )
    wg = cfg.num_windows
    dev_buckets = np.asarray(
        MP.window_group_bucket_sums(
            jnp.asarray(table), jnp.asarray(digits_dev.T), nb=cfg.num_buckets,
            interpret=interpret,
        )
    ).reshape(wg, cfg.num_buckets, TW)
    ident_aff = ExtPoint(0, 1, 0, 1).to_affine()
    for w in range(wg):
        for b in range(cfg.num_buckets):
            wantp = want_buckets[w][b].to_affine()
            if wantp == ident_aff:
                continue
            got = _unpack_row(dev_buckets[w, b])
            assert got.to_affine() == wantp, (
                f"stage 2/3 bucket mismatch window {w} bucket {b}"
            )
    status["buckets (transpose+smvp)"] = "ok"

    # Stage 4 + end-to-end: window sums -> Horner vs naive sum
    # (reference: :1087-1363 and the fixture gate).
    res = cuzk.compute_msm(coords, sc, chunk_size=chunk_size, interpret=interpret)
    want = ExtPoint(0, 1, 0, 1)
    for p, s in zip(pts_cpu, scalars_int):
        want = want.add(p.mul(s))
    assert (res["x"], res["y"]) == want.to_affine(), "stage 4/horner mismatch"
    status["bpr + horner"] = "ok"
    return status
