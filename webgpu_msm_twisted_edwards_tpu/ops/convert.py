"""Stage 1: point-coordinate conversion and signed scalar decomposition.

TPU re-design of the reference's first kernel
(reference: src/submission/implementation/wgsl/cuzk/
convert_point_coords_and_decompose_scalars.template.wgsl): inputs arrive as
[n, 8] uint32 little-endian words per coordinate/scalar; coordinates are
re-limbed into [n, NUM_WORDS] w-bit limbs and converted to Montgomery form;
scalars are split into signed c-bit window digits.

Everything is batch-vectorized; per-limb extraction uses *static* word indices
and shifts computed at trace time, so no dynamic shifts are emitted.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.params import PARAMS, FieldParams, MsmConfig
from . import field as F

U32 = F.U32


def u32_words_to_limbs(words: jnp.ndarray, params: FieldParams = PARAMS) -> jnp.ndarray:
    """[..., 8] uint32 LE words -> [..., NUM_WORDS] w-bit limbs.

    Re-design of the byte-repack + extract_word_from_bytes_le pair
    (reference: convert...template.wgsl:50-72 and
    wgsl/cuzk/extract_word_from_bytes_le.template.wgsl): each w-bit limb is
    assembled from one or two u32 words with static shifts.
    """
    w = params.word_size
    mask = U32(params.mask)
    num_u32 = words.shape[-1]
    total_bits = num_u32 * 32
    limbs = []
    for i in range(params.num_words):
        b = i * w
        idx = b // 32
        off = b % 32
        lo = words[..., idx] >> U32(off)
        if off + w > 32 and idx + 1 < num_u32:
            hi = words[..., idx + 1] << U32(32 - off)
            lo = lo | hi
        # Bits beyond total_bits are zero by construction (values < p < 2^253).
        limbs.append(lo & mask)
        assert b < total_bits
    return jnp.stack(limbs, axis=-1)


def limbs_to_u32_words(limbs: jnp.ndarray, num_u32: int = 8, params: FieldParams = PARAMS) -> jnp.ndarray:
    """Inverse of :func:`u32_words_to_limbs` (device-side repack)."""
    w = params.word_size
    words = []
    for j in range(num_u32):
        acc = jnp.zeros(limbs.shape[:-1], dtype=U32)
        for i in range(params.num_words):
            b = i * w
            # Which bits of limb i land in word j?
            if b + w <= j * 32 or b >= (j + 1) * 32:
                continue
            shift = b - j * 32
            if shift >= 0:
                acc = acc | (limbs[..., i] << U32(shift))
            else:
                acc = acc | (limbs[..., i] >> U32(-shift))
        words.append(acc)
    return jnp.stack(words, axis=-1)


def points_to_mont_limbs(
    coords_u32: jnp.ndarray, params: FieldParams = PARAMS
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[n, 2, 8] affine (x, y) u32 words -> Montgomery-form limb arrays
    (x_m, y_m, t_m) each [n, NUM_WORDS]; z is implicitly R (affine 1).

    Reference analogue: convert...template.wgsl:74-77 enters Montgomery form
    with a Barrett field_mul(x, r); here it's mont_mul(x, R^2).  The extended
    coordinate t = x*y is precomputed once (the reference instead recomputes it
    per SMVP gather, smvp.template.wgsl:103-109 — one visit per point either
    way)."""
    x = u32_words_to_limbs(coords_u32[:, 0, :], params)
    y = u32_words_to_limbs(coords_u32[:, 1, :], params)
    xm = F.to_mont(x, params)
    ym = F.to_mont(y, params)
    tm = F.mont_mul(xm, ym, params)
    return xm, ym, tm


def decompose_scalars_signed(
    scalars_u32: jnp.ndarray, cfg: MsmConfig
) -> jnp.ndarray:
    """[n, 8] uint32 LE scalar words -> [n, num_windows] signed digits (int32)
    in [-2^(c-1), 2^(c-1)-1], such that scalar == sum(d_i * 2^(c*i)).

    Reference analogue: convert...template.wgsl:97-120 (and CPU mirror
    miscellaneous/utils.ts:52-95).  The final carry is provably 0 for scalars
    below the subgroup order; it is dropped here (asserted in tests).
    """
    c = cfg.chunk_size
    l = 1 << c
    half = l >> 1
    mask = U32(l - 1)
    num_u32 = scalars_u32.shape[-1]

    # Static-shift window extraction.
    raw = []
    for i in range(cfg.num_windows):
        b = i * c
        idx = b // 32
        off = b % 32
        v = scalars_u32[..., idx] >> U32(off)
        if off + c > 32 and idx + 1 < num_u32:
            v = v | (scalars_u32[..., idx + 1] << U32(32 - off))
        raw.append(v & mask)

    # Sequential signed-carry pass over the (few) windows.
    digits = []
    carry = jnp.zeros(scalars_u32.shape[:-1], dtype=jnp.int32)
    for i in range(cfg.num_windows):
        d = raw[i].astype(jnp.int32) + carry
        wrap = d >= half
        digits.append(jnp.where(wrap, d - l, d))
        carry = wrap.astype(jnp.int32)
    return jnp.stack(digits, axis=-1)
