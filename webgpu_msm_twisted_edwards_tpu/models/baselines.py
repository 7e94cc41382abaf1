"""Baseline MSM implementations with the uniform `(points, scalars) -> {x,y}`
entry signature.

Role parity with the reference's baseline layer (reference:
src/reference/reference.ts:9-74), which exposes every implementation behind
the same API so the benchmark harness can race them:

| reference entry              | TPU-framework analogue here            |
|------------------------------|----------------------------------------|
| webgpu_pippenger_msm         | tpu_pippenger_msm (pure-XLA pipeline)  |
| webgpu_compute_msm (naive)   | tpu_naive_msm (per-point double-and-add)|
| wasm_compute_msm             | cpu_compute_msm (native C++ serial)    |
| wasm_compute_msm_parallel    | cpu_compute_msm_parallel (std::thread) |
| webgpu_best_msm              | best_msm (the Pallas production path)  |
"""

from __future__ import annotations

import numpy as np

from ..utils import oracle
from . import cuzk


def tpu_pippenger_msm(points, scalars, chunk_size: int | None = None) -> dict[str, int]:
    """Pure-XLA signed Pippenger (the pre-Pallas pipeline) — the analogue of
    the reference's Pippenger baseline (reference:
    src/reference/webgpu/entries/pippengerMSMEntry.ts:54-168)."""
    return cuzk.compute_msm(points, scalars, chunk_size=chunk_size, use_pallas=False)


def tpu_naive_msm(points, scalars) -> dict[str, int]:
    """Naive MSM: every point multiplied by its full 256-bit scalar on device
    (SIMD double-and-add), then a log-depth tree sum — the analogue of the
    reference's naive multipass baseline (reference:
    src/reference/webgpu/entries/naiveMSMEntry.ts:38-260, one full
    point.multiply per input on the GPU, final sum on CPU).

    Intentionally simple and slow; useful as an independent device-side
    cross-check of the curve kernels."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops import convert as CV
    from ..ops import curve as C
    from ..ops import field as F
    from ..utils.params import PARAMS

    coords, sc = cuzk.prepare_inputs(points, scalars)
    n = coords.shape[0]

    @jax.jit
    def run(coords_u32, scalars_u32):
        xm, ym, tm = CV.points_to_mont_limbs(coords_u32, PARAMS)
        z = jnp.broadcast_to(F.r_limbs(PARAMS), xm.shape)
        pts = C.PointXYTZ(xm, ym, tm, z)
        acc = C.identity((n,), PARAMS)

        def body(i, acc):
            word = 7 - i // 32
            bit = jnp.uint32(31 - i % 32)
            take = ((scalars_u32[:, word] >> bit) & 1) == 1
            acc = C.double(acc, PARAMS)
            return C.select(take, C.add(acc, pts, PARAMS), acc)

        acc = lax.fori_loop(0, 256, body, acc)
        return C.tree_reduce_axis(acc, axis=0, params=PARAMS)

    out = run(jnp.asarray(coords), jnp.asarray(sc))
    res = cuzk.window_sums_to_extpoints(
        jax.tree_util.tree_map(lambda a: np.asarray(a)[None], out)
    )[0]
    x, y = res.to_affine()
    return {"x": x, "y": y}


def _oracle_inputs(points, scalars):
    """Normalize API inputs to the oracle's u64-limb buffers: points may be
    (x, y) int pairs or the device [n, 2, 8] u32 word layout; scalars ints or
    [n, 8] u32 words."""
    if isinstance(points, np.ndarray) and points.dtype == np.uint32:
        points = np.ascontiguousarray(points).view(np.uint64).reshape(points.shape[0], 8)
    if isinstance(scalars, np.ndarray) and scalars.dtype == np.uint32:
        scalars = np.ascontiguousarray(scalars).view(np.uint64).reshape(scalars.shape[0], 4)
    return points, scalars


def cpu_compute_msm(points, scalars) -> dict[str, int]:
    """Native serial CPU MSM (C++ oracle) — the analogue of the reference's
    single-threaded WASM baseline (reference: reference.ts:29-39)."""
    points, scalars = _oracle_inputs(points, scalars)
    x, y = oracle.msm(points, scalars)
    return {"x": x, "y": y}


def cpu_compute_msm_parallel(points, scalars) -> dict[str, int]:
    """Native multi-threaded CPU MSM — the analogue of
    wasm_compute_msm_parallel (reference: reference.ts:48-56)."""
    points, scalars = _oracle_inputs(points, scalars)
    x, y = oracle.msm_parallel(points, scalars)
    return {"x": x, "y": y}


def best_msm(points, scalars) -> dict[str, int]:
    """The production submission (Pallas pipeline) — analogue of
    webgpu_best_msm (reference: reference.ts:41-46)."""
    return cuzk.compute_msm(points, scalars)


#: Registry used by the benchmark harness (name -> entry), mirroring the
#: reference UI's function list (reference: src/ui/AllBenchmarks.tsx:156-222).
ALL_MSM_FUNCTIONS = {
    "your_msm (pallas)": best_msm,
    "tpu_pippenger_msm (xla)": tpu_pippenger_msm,
    "tpu_naive_msm": tpu_naive_msm,
    "cpu_compute_msm": cpu_compute_msm,
    "cpu_compute_msm_parallel": cpu_compute_msm_parallel,
}
