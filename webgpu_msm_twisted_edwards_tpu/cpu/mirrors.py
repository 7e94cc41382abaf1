"""Pure-Python mirrors of every device pipeline stage.

These are the "fake backend" used by unit tests and per-stage debug
validators, in the same role as the reference's CPU mirror algorithms
(reference: src/submission/miscellaneous/{utils,transpose,smvp,bpr}.ts and the
debug_* validators in src/submission/submission.ts:892-1363).
"""

from __future__ import annotations

from ..utils.params import MsmConfig, SUBGROUP_ORDER
from .curve import ExtPoint


def decompose_scalars_signed(scalars: list[int], num_windows: int, window_bits: int) -> list[list[int]]:
    """Signed window decomposition, one list of digits per scalar.

    Each digit is in [-2^(c-1), 2^(c-1)-1] and
    scalar == sum(digit[i] * 2^(c*i)).  Mirror of the reference's scheme
    (reference: miscellaneous/utils.ts:52-95 `decompose_scalars_signed` and
    wgsl/cuzk/convert_point_coords_and_decompose_scalars.template.wgsl:97-120),
    except digits are returned unshifted (the reference adds 2^(c-1) for
    unsigned storage).
    """
    l = 1 << window_bits
    half = l >> 1
    mask = l - 1
    out = []
    for s in scalars:
        digits = []
        carry = 0
        for i in range(num_windows):
            d = ((s >> (i * window_bits)) & mask) + carry
            if d >= half:
                d -= l
                carry = 1
            else:
                carry = 0
            digits.append(d)
        if carry:
            raise ValueError("final carry is 1 — scalar too large for signed windows")
        out.append(digits)
    return out


def bucket_accumulation_signed(
    points: list[ExtPoint], digits_per_scalar: list[list[int]], num_windows: int, window_bits: int
) -> list[list[ExtPoint]]:
    """Per-window signed bucket sums.

    Returns buckets[w][b] == sum of (sign * P_i) over points whose window-w
    digit has |digit| == b+1 (bucket 0 of the reference is the discarded zero
    digit).  This is the combined mirror of the reference's transpose + SMVP
    stages (reference: miscellaneous/transpose.ts:14-62 `cpu_transpose` and
    miscellaneous/smvp.ts:37-102 `cpu_smvp_signed`).
    """
    nb = 1 << (window_bits - 1)
    buckets = [[ExtPoint.identity() for _ in range(nb)] for _ in range(num_windows)]
    for pt, digits in zip(points, digits_per_scalar):
        for w in range(num_windows):
            d = digits[w]
            if d == 0:
                continue
            idx = abs(d) - 1
            addend = pt if d > 0 else pt.neg()
            buckets[w][idx] = buckets[w][idx].add(addend)
    return buckets


def running_sum_bucket_reduction(buckets: list[ExtPoint]) -> ExtPoint:
    """Serial reduction: sum_b (b+1) * buckets[b]  (weights start at 1).

    Mirror of reference miscellaneous/bpr.ts:4-25
    `running_sum_bucket_reduction`.
    """
    m = ExtPoint.identity()
    g = ExtPoint.identity()
    for b in range(len(buckets) - 1, -1, -1):
        m = m.add(buckets[b])
        g = g.add(m)
    return g


def parallel_bucket_reduction(buckets: list[ExtPoint], num_threads: int = 4) -> ExtPoint:
    """Two-stage parallel running-sum reduction (cuZK Algorithm 4).

    Mirror of reference miscellaneous/bpr.ts:74-131
    (`parallel_bucket_reduction_1` + `_2`): each "thread" t owns a contiguous
    chunk, computes its local running sum g_t and chunk total m_t, then adds
    the fix-up m_t * (chunk_base) by double-and-add.
    """
    nb = len(buckets)
    assert nb % num_threads == 0
    chunk = nb // num_threads
    total = ExtPoint.identity()
    for t in range(num_threads):
        m = ExtPoint.identity()
        g = ExtPoint.identity()
        for k in range(chunk - 1, -1, -1):
            m = m.add(buckets[t * chunk + k])
            g = g.add(m)
        # Local weights were 1..chunk; true weights are t*chunk+1..(t+1)*chunk.
        g = g.add(m.mul(t * chunk))
        total = total.add(g)
    return total


def horner(window_sums: list[ExtPoint], window_bits: int) -> ExtPoint:
    """Combine per-window sums: result = sum_w 2^(c*w) * S_w via Horner
    (reference: submission.ts:400-407)."""
    acc = window_sums[-1]
    for w in range(len(window_sums) - 2, -1, -1):
        for _ in range(window_bits):
            acc = acc.double()
        acc = acc.add(window_sums[w])
    return acc


def cuzk_serial_msm(points: list[ExtPoint], scalars: list[int], cfg: MsmConfig) -> ExtPoint:
    """End-to-end serial mirror of the full cuZK pipeline — decompose ->
    buckets -> running-sum reduction -> Horner.  The analogue of the
    reference's serial TypeScript cuZK
    (reference: miscellaneous/cuzk/cuzk_serial.ts:147-169)."""
    scalars = [s % SUBGROUP_ORDER for s in scalars]
    digits = decompose_scalars_signed(scalars, cfg.num_windows, cfg.chunk_size)
    buckets = bucket_accumulation_signed(points, digits, cfg.num_windows, cfg.chunk_size)
    sums = [running_sum_bucket_reduction(b) for b in buckets]
    return horner(sums, cfg.chunk_size)


def pippenger_msm(points: list[ExtPoint], scalars: list[int], window_bits: int = 16) -> ExtPoint:
    """Classic unsigned Pippenger (the reference baseline's algorithm,
    reference: src/reference/webgpu/entries/pippengerMSMEntry.ts:54-168)."""
    num_windows = -(-256 // window_bits)
    mask = (1 << window_bits) - 1
    sums = []
    for w in range(num_windows):
        buckets: dict[int, ExtPoint] = {}
        for pt, s in zip(points, scalars):
            d = (s >> (w * window_bits)) & mask
            if d == 0:
                continue
            buckets[d] = buckets[d].add(pt) if d in buckets else pt
        acc = ExtPoint.identity()
        for d, bp in buckets.items():
            acc = acc.add(bp.mul(d))
        sums.append(acc)
    return horner(sums, window_bits)
