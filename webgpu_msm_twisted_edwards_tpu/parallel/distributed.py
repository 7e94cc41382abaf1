"""Multi-host MSM over DCN: process bootstrap and global-mesh execution.

The reference lists multi-device proof generation as future work
(reference: README.md:551 "Multi-device proof generation … via peer-to-peer
networking"); this module is the TPU-native realization for pod slices that
span hosts.  Design (SURVEY.md §2.5/§2.6):

- `initialize()` wraps `jax.distributed.initialize` — the only bootstrap a
  JAX multi-host program needs (no explicit transport code; collectives ride
  ICI within a host/slice and DCN across hosts).
- each process feeds its local shard of points/scalars;
  `jax.make_array_from_process_local_data` assembles the global sharded
  arrays without gathering them anywhere.
- the compute is exactly `parallel.sharded.sharded_window_sums_pallas` over
  the global mesh: per-shard full MSM, then an all_gather + fold of [W, TW]
  packed window sums — a few KB per device, so DCN cost is negligible.

Single-host multi-chip needs none of this; it is exercised in CI via the
8-device virtual CPU mesh (tests/test_sharded.py) and the driver's
`dryrun_multichip`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..utils.params import MsmConfig, default_msm_config


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bootstrap multi-host JAX (idempotent).  With TPU pod metadata
    available, all arguments are auto-detected."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "points"):
    """One mesh axis over every chip in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


def compute_msm_multihost(
    local_coords: np.ndarray,
    local_scalars: np.ndarray,
    chunk_size: int | None = None,
) -> dict[str, int]:
    """MSM over points distributed across all processes.

    Every process passes its own [n_local, 2, 8] coords and [n_local, 8]
    scalars (equal n_local everywhere); returns the identical global result
    in every process."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..cpu.mirrors import horner
    from ..models import cuzk
    from .sharded import sharded_window_sums_pallas

    local_scalars = cuzk.reduce_scalars_mod_order(local_scalars)
    mesh = global_mesh()
    axis = mesh.axis_names[0]
    n_global = local_coords.shape[0] * jax.process_count()
    cfg = default_msm_config(n_global) if chunk_size is None else MsmConfig(chunk_size=chunk_size)

    sharding = NamedSharding(mesh, P(axis))
    gcoords = jax.make_array_from_process_local_data(sharding, local_coords)
    gscalars = jax.make_array_from_process_local_data(sharding, local_scalars)

    fn = jax.jit(partial(sharded_window_sums_pallas, mesh=mesh, cfg=cfg, axis_name=axis))
    rows = np.asarray(fn(gcoords, gscalars))
    pts = cuzk.packed_rows_to_extpoints(rows)
    total = horner(pts, cfg.chunk_size)
    x, y = total.to_affine()
    return {"x": x, "y": y}
