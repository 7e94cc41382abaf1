"""Limb and byte codecs: python ints <-> numpy limb arrays <-> GPU-style byte
buffers.

Capability parity with the reference codec layer
(reference: src/submission/implementation/cuzk/utils.ts:118-131,262-303,440-496
and src/reference/webgpu/utils.ts:90-112), implemented array-first with numpy.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np

from .params import PARAMS, FieldParams


def int_to_words_le(val: int, num_words: int, word_size: int) -> np.ndarray:
    """Little-endian fixed-width limb decomposition of a python int.

    Mirror of `to_words_le` (reference utils.ts:440-456); returns uint32.
    """
    mask = (1 << word_size) - 1
    out = np.empty(num_words, dtype=np.uint32)
    for i in range(num_words):
        out[i] = (val >> (i * word_size)) & mask
    return out


def words_le_to_int(words: Sequence[int] | np.ndarray, word_size: int) -> int:
    """Inverse of :func:`int_to_words_le` (reference utils.ts:479-496)."""
    val = 0
    for i, w in enumerate(np.asarray(words).tolist()):
        val += int(w) << (i * word_size)
    return val


def ints_to_limbs(vals: Iterable[int], params: FieldParams = PARAMS) -> np.ndarray:
    """[n] python ints -> [n, num_words] uint32 limb matrix (vectorized)."""
    vals = list(vals)
    n = len(vals)
    nw, w = params.num_words, params.word_size
    out = np.empty((n, nw), dtype=np.uint32)
    mask = params.mask
    for i, v in enumerate(vals):
        for j in range(nw):
            out[i, j] = (v >> (j * w)) & mask
    return out


def limbs_to_ints(arr: np.ndarray, params: FieldParams = PARAMS) -> list[int]:
    """[n, num_words] limb matrix -> list of python ints."""
    arr = np.asarray(arr, dtype=np.uint64)
    w = params.word_size
    out = []
    for row in arr:
        val = 0
        for j in range(arr.shape[1] - 1, -1, -1):
            val = (val << w) | int(row[j])
        out.append(val)
    return out


def ints_to_u32_words(vals: Iterable[int], num_u32: int = 8) -> np.ndarray:
    """[n] ints -> [n, num_u32] uint32, little-endian 32-bit words.

    This is the device input layout for coordinates and scalars — the analogue
    of the reference's flat u32 storage buffers
    (reference: src/reference/webgpu/utils.ts:90-112 `bigIntsToBufferLE`).
    """
    vals = list(vals)
    out = np.empty((len(vals), num_u32), dtype=np.uint32)
    for i, v in enumerate(vals):
        for j in range(num_u32):
            out[i, j] = (v >> (32 * j)) & 0xFFFFFFFF
    return out


def u32_words_to_ints(arr: np.ndarray) -> list[int]:
    """Inverse of :func:`ints_to_u32_words`."""
    arr = np.asarray(arr, dtype=np.uint64)
    out = []
    for row in arr:
        val = 0
        for j in range(arr.shape[1] - 1, -1, -1):
            val = (val << 32) | int(row[j])
        out.append(val)
    return out


def bigint_to_u8_for_gpu(val: int, num_words: int, word_size: int) -> np.ndarray:
    """Pack a bigint into the reference's per-limb u32-as-4-bytes LE layout
    (reference utils.ts:262-303 `bigints_to_u8_for_gpu`): each w-bit limb is
    stored as a little-endian u32 occupying 4 bytes.
    """
    words = int_to_words_le(val, num_words, word_size)
    return words.astype("<u4").view(np.uint8)


def u8s_to_bigint(u8s: np.ndarray, num_words: int, word_size: int) -> int:
    """Inverse of :func:`bigint_to_u8_for_gpu` (reference utils.ts:104-116)."""
    words = np.frombuffer(np.asarray(u8s, dtype=np.uint8).tobytes(), dtype="<u4")
    assert words.size == num_words
    return words_le_to_int(words, word_size)
