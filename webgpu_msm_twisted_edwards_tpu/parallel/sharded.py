"""Multi-chip / multi-host MSM: point-axis data parallelism over a device mesh.

The reference is single-device by construction (WebGPU has no multi-device
API; distribution is explicitly future work, reference README.md:551).  This
module is the new first-class component called for in SURVEY.md §2.5: points
and scalars are sharded across a `jax.sharding.Mesh` axis with `shard_map`;
each shard runs the *full* local pipeline (decompose → sort → bucket
accumulate → BPR) on its points, producing only its 16 per-window partial sums
(a few KB).  Those ride the ICI via `all_gather` and are folded with a
log-depth EC tree reduction, so cross-chip traffic is O(num_windows) points —
the cheapest possible decomposition of an MSM (EC sums over disjoint point
subsets add).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models import cuzk
from ..ops import curve as C
from ..utils.params import MsmConfig, default_msm_config


def default_mesh(num_devices: int | None = None, axis_name: str = "points") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def sharded_window_sums(
    coords_u32: jnp.ndarray,
    scalars_u32: jnp.ndarray,
    mesh: Mesh,
    cfg: MsmConfig,
    bpr_chunks: int = 256,
    axis_name: str = "points",
) -> C.PointXYTZ:
    """[n,2,8] coords + [n,8] scalars (n divisible by mesh size) ->
    replicated [W] window-sum points (Montgomery limbs)."""

    def local_fn(c, s):
        sums = cuzk.msm_window_sums_device(c, s, cfg, bpr_chunks)  # [W]
        flat = jnp.stack([sums.x, sums.y, sums.t, sums.z], axis=1)  # [W, 4, nw]
        gathered = jax.lax.all_gather(flat, axis_name)  # [D, W, 4, nw]
        pts = C.PointXYTZ(
            gathered[:, :, 0], gathered[:, :, 1], gathered[:, :, 2], gathered[:, :, 3]
        )
        total = C.tree_reduce_axis(pts, axis=0)  # [W]
        return jnp.stack([total.x, total.y, total.t, total.z], axis=1)

    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(),
        check_rep=False,
    )(coords_u32, scalars_u32)
    return C.PointXYTZ(out[:, 0], out[:, 1], out[:, 2], out[:, 3])


@lru_cache(maxsize=None)
def _jitted_sharded(mesh: Mesh, chunk_size: int, bpr_chunks: int, axis_name: str):
    cfg = MsmConfig(chunk_size=chunk_size)
    fn = partial(
        sharded_window_sums, mesh=mesh, cfg=cfg, bpr_chunks=bpr_chunks, axis_name=axis_name
    )
    return jax.jit(fn)


def compute_msm_sharded(
    points: Sequence[tuple[int, int]] | np.ndarray,
    scalars: Sequence[int] | np.ndarray,
    mesh: Mesh | None = None,
    chunk_size: int | None = None,
    bpr_chunks: int = 256,
) -> dict[str, int]:
    """Multi-device analogue of `compute_msm`: same signature and result, with
    the point axis sharded over the mesh."""
    coords, sc = cuzk.prepare_inputs(points, scalars)
    n = coords.shape[0]
    if mesh is None:
        mesh = default_mesh()
    ndev = mesh.devices.size
    assert n % ndev == 0, f"n={n} must be divisible by mesh size {ndev}"
    cfg = default_msm_config(n) if chunk_size is None else MsmConfig(chunk_size=chunk_size)
    fn = _jitted_sharded(mesh, cfg.chunk_size, bpr_chunks, mesh.axis_names[0])
    sums = fn(jnp.asarray(coords), jnp.asarray(sc))
    sums = jax.tree_util.tree_map(np.asarray, sums)
    pts = cuzk.window_sums_to_extpoints(sums)
    from ..cpu.mirrors import horner

    total = horner(pts, cfg.chunk_size)
    x, y = total.to_affine()
    return {"x": x, "y": y}
