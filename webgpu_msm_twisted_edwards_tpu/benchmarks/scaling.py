"""Multi-chip scaling benchmark: MSM throughput vs mesh size.

The reference has no multi-device story (README.md:551 lists it as future
work); this measures the new first-class capability (SURVEY.md §2.5): shard
the point axis over a `jax.sharding.Mesh`, run the full per-shard pipeline,
fold the [W, TW] window sums over ICI.  Scaling efficiency at k chips is
t(1) / (k * t(k)).

Production-path fidelity (VERDICT r4 #3): mode="points" dispatches the SAME
staged SPMD programs `compute_msm_sharded` runs (`sharded_window_sums_staged`
on the Pallas path) with the SAME per-shard window tuning (`sharded_msm_plan`
— window size follows n/ndev, not the global n); mode="batch" dispatches the
`compute_msm_batch_sharded` internals.  First-run compile per mesh size is
its own column, so a pod run also records the cold-start story.

On a single-chip rig this degenerates to k=1 (the harness still runs); on a
pod slice it sweeps 1, 2, 4, ... chips.  On CPU it exercises the virtual
device mesh with the XLA pipeline (structure test, not a perf number).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

from .timing import Table, median


def run(log2n: int = 18, runs: int = 3, mode: str = "points") -> Table:
    """mode="points": shard ONE MSM's point axis (latency scaling — speedup
    column).  mode="batch": k MSMs over a fixed SRS with the BATCH axis
    sharded (throughput scaling — one whole MSM per chip, zero cross-device
    EC traffic; the ms/MSM column should stay flat as chips grow)."""
    import jax
    import jax.numpy as jnp

    from ..parallel import sharded
    from ..utils import oracle
    from ..utils.params import default_msm_config, tpu_msm_config

    n = 1 << log2n
    pts_u64 = oracle.gen_points(n, seed=20230923)
    rng = np.random.default_rng(42)
    coords = jax.device_put(jnp.asarray(pts_u64.view(np.uint32).reshape(n, 2, 8)))
    on_tpu = jax.default_backend() == "tpu"

    def gen_scalars(count):
        sc = rng.integers(0, 1 << 62, size=(count, n, 4), dtype=np.uint64)
        sc[:, :, 3] &= (1 << 58) - 1
        return sc.view(np.uint32).reshape(count, n, 8)

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jax.device_get(leaf[(slice(0, 1),) * leaf.ndim])

    ndev = jax.device_count()
    sizes = [k for k in (1, 2, 4, 8, 16, 32) if k <= ndev]
    t1 = None
    if mode == "batch":
        table = Table(["chips", "batch k", "pipeline", "compile (s)",
                       "median (ms)", "ms/MSM", "efficiency"])
    else:
        table = Table(["chips", "pipeline", "c", "compile (s)", "median (ms)",
                       "speedup", "efficiency"])
        scalars = jax.device_put(jnp.asarray(gen_scalars(1)[0]))
    for k in sizes:
        mesh = sharded.default_mesh(k)
        axis = mesh.axis_names[0]
        if mode == "batch":
            # compute_msm_batch_sharded's dispatch: the batch axis sharded,
            # window sizing follows the FULL n (every chip sees all points).
            scalars_k = jax.device_put(jnp.asarray(gen_scalars(k)))
            cfg = tpu_msm_config(n) if on_tpu and n >= 4096 else default_msm_config(n)
            pipeline = ("pallas" if on_tpu and cfg.chunk_size >= 8 and n >= 512
                        else "xla")
            if pipeline == "pallas":
                fn = sharded._jitted_batch_rows(mesh, cfg.chunk_size, axis)
            else:
                fn = sharded._jitted_batch_sums(mesh, cfg.chunk_size, 256, axis)
            args = (coords, scalars_k)
        else:
            # compute_msm_sharded's dispatch: per-shard window tuning +
            # the staged SPMD programs on the Pallas path.
            cfg, pipeline = sharded.sharded_msm_plan(n, k)
            if pipeline == "pallas":
                fn = partial(sharded.sharded_window_sums_staged, mesh=mesh,
                             cfg=cfg, axis_name=axis, fold=True)
            else:
                fn = sharded._jitted_sharded(mesh, cfg.chunk_size, 256, axis)
            args = (coords, scalars)
        t0 = time.time()
        force(fn(*args))
        compile_s = time.time() - t0
        ts = []
        for _i in range(runs):
            t0 = time.time()
            force(fn(*args))
            ts.append((time.time() - t0) * 1e3)
        m = median(ts)
        if t1 is None:
            t1 = m
        if mode == "batch":
            # Throughput efficiency: MSM-rate at k chips vs k * rate at 1.
            table.add(k, k, pipeline, round(compile_s, 1), round(m, 1),
                      round(m / k, 1), round(t1 / m, 3))
        else:
            table.add(k, pipeline, cfg.chunk_size, round(compile_s, 1),
                      round(m, 1), round(t1 / m, 2), round(t1 / (k * m), 3))
        print(table.markdown().splitlines()[-1], flush=True)
    return table
