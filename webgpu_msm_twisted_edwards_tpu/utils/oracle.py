"""ctypes bindings for the native C++ oracle (cpp/liboracle.so).

Role parity with the reference's WASM oracle wrappers
(reference: src/reference/utils/wasmFunctions.ts:5-178 and
src/workers/wasmMSM.ts) — a fast, trusted CPU MSM used as ground truth for
large random inputs.  Build with `make -C cpp`.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "liboracle.so")


def available() -> bool:
    return os.path.exists(_LIB_PATH)


@lru_cache(maxsize=None)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.oracle_msm.argtypes = [u64p, u64p, ctypes.c_size_t, ctypes.c_int, u64p]
    lib.oracle_msm.restype = None
    lib.oracle_msm_parallel.argtypes = [
        u64p, u64p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, u64p
    ]
    lib.oracle_msm_parallel.restype = None
    lib.oracle_fp_mul.argtypes = [u64p, u64p, u64p]
    lib.oracle_fp_mul.restype = None
    lib.oracle_point_add.argtypes = [u64p, u64p, u64p]
    lib.oracle_point_add.restype = None
    lib.oracle_gen_points.argtypes = [ctypes.c_size_t, ctypes.c_uint64, u64p]
    lib.oracle_gen_points.restype = None
    return lib


def gen_points(n: int, seed: int = 1) -> np.ndarray:
    """Generate n deterministic affine curve points as an [n, 8] uint64 array
    (x limbs 0..3, y limbs 4..7) via a native additive walk + batch inversion.
    Fast enough for n = 2^20 fixtures."""
    out = np.zeros((n, 8), dtype=np.uint64)
    _lib().oracle_gen_points(n, seed, _ptr(out))
    return out


def points_u64_to_ints(arr: np.ndarray) -> list[tuple[int, int]]:
    out = []
    for row in arr:
        x = _u64x4_to_int(row[:4])
        y = _u64x4_to_int(row[4:])
        out.append((x, y))
    return out


def _int_to_u64x4(v: int) -> np.ndarray:
    return np.array([(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)], dtype=np.uint64)


def _u64x4_to_int(a: np.ndarray) -> int:
    v = 0
    for i in range(3, -1, -1):
        v = (v << 64) | int(a[i])
    return v


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def fp_mul(a: int, b: int) -> int:
    out = np.zeros(4, dtype=np.uint64)
    _lib().oracle_fp_mul(_ptr(_int_to_u64x4(a)), _ptr(_int_to_u64x4(b)), _ptr(out))
    return _u64x4_to_int(out)


def point_add(p1: tuple[int, int], p2: tuple[int, int]) -> tuple[int, int]:
    a = np.concatenate([_int_to_u64x4(p1[0]), _int_to_u64x4(p1[1])])
    b = np.concatenate([_int_to_u64x4(p2[0]), _int_to_u64x4(p2[1])])
    out = np.zeros(8, dtype=np.uint64)
    _lib().oracle_point_add(_ptr(a), _ptr(b), _ptr(out))
    return _u64x4_to_int(out[:4]), _u64x4_to_int(out[4:])


def msm(points: list[tuple[int, int]] | np.ndarray, scalars: list[int] | np.ndarray, c: int = 16) -> tuple[int, int]:
    """Affine MSM result via the native serial Pippenger implementation.

    `points` may be a list of (x, y) ints or an [n, 8] uint64 array;
    `scalars` a list of ints or an [n, 4] uint64 array.
    """
    pbuf, sbuf, n = _pack_inputs(points, scalars)
    out = np.zeros(8, dtype=np.uint64)
    _lib().oracle_msm(_ptr(pbuf), _ptr(sbuf), n, c, _ptr(out))
    return _u64x4_to_int(out[:4]), _u64x4_to_int(out[4:])


def _pack_inputs(points, scalars):
    if isinstance(points, np.ndarray):
        pbuf = np.ascontiguousarray(points, dtype=np.uint64).reshape(-1)
        n = points.shape[0]
    else:
        n = len(points)
        pbuf = np.empty(n * 8, dtype=np.uint64)
        for i, (x, y) in enumerate(points):
            pbuf[i * 8 : i * 8 + 4] = _int_to_u64x4(x)
            pbuf[i * 8 + 4 : i * 8 + 8] = _int_to_u64x4(y)
    if isinstance(scalars, np.ndarray):
        sbuf = np.ascontiguousarray(scalars, dtype=np.uint64).reshape(-1)
    else:
        sbuf = np.empty(n * 4, dtype=np.uint64)
        for i, sv in enumerate(scalars):
            sbuf[i * 4 : i * 4 + 4] = _int_to_u64x4(sv)
    return pbuf, sbuf, n


def msm_parallel(points, scalars, c: int = 16, nthreads: int = 0) -> tuple[int, int]:
    """Multi-threaded native MSM, one thread per scalar window (role parity
    with the reference's rayon-backed Aleo `msm_parallel`,
    reference: src/workers/aleo-wasm-web aleo_wasm.d.ts:144-150 and
    src/workers/wasmMSM.ts:4-8 which sizes the pool to hardwareConcurrency-2).
    """
    import os as _os

    if nthreads <= 0:
        nthreads = max(1, (_os.cpu_count() or 2) - 2)
    pbuf, sbuf, n = _pack_inputs(points, scalars)
    out = np.zeros(8, dtype=np.uint64)
    _lib().oracle_msm_parallel(_ptr(pbuf), _ptr(sbuf), n, c, nthreads, _ptr(out))
    return _u64x4_to_int(out[:4]), _u64x4_to_int(out[4:])
