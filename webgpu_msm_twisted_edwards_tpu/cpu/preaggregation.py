"""Cluster-based CSR pre-aggregation — CPU mirror of the reference's explored
bucket-preprocessing experiments.

Capability parity with reference:
src/submission/miscellaneous/cuzk/create_csr.ts:100-298
(`precompute_with_cluster_method`, `pre_aggregate`, `all_precomputation`,
`create_csr_cpu`) and the GPU variant create_csr_gpu.ts.  Idea: points whose
scalar chunk (bucket) collides within a window are pre-added so the sparse
matrix has at most one entry per (row, bucket) — trading EC adds before CSR
construction for fewer SMVP adds.  The production TPU pipeline gets the same
effect from its sorted segmented scan, so this stays an experiment, mirrored
for tests exactly like the reference mirrors it (its unit test substitutes
string concatenation for the group op,
reference: miscellaneous/tests/create_csr.test.ts:12-93).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from .matrices import CSRSparseMatrix


def precompute_with_cluster_method(
    chunks: Sequence[int], n_rows: int
) -> dict[int, list[int]]:
    """Group point indices by identical chunk value (reference:
    create_csr.ts:100-140).  Zero chunks are skipped (no bucket)."""
    clusters: dict[int, list[int]] = {}
    for i, c in enumerate(chunks):
        if c == 0:
            continue
        clusters.setdefault(c, []).append(i)
    return clusters


def pre_aggregate(
    points: Sequence[Any],
    clusters: dict[int, list[int]],
    add: Callable[[Any, Any], Any],
) -> tuple[list[Any], list[int]]:
    """Pre-add each cluster's points (reference: create_csr.ts
    `pre_aggregate`); returns (aggregated values, their chunk values)."""
    vals, chunk_vals = [], []
    for c, idxs in clusters.items():
        acc = points[idxs[0]]
        for i in idxs[1:]:
            acc = add(acc, points[i])
        vals.append(acc)
        chunk_vals.append(c)
    return vals, chunk_vals


def create_csr_cpu(
    points: Sequence[Any],
    chunks: Sequence[int],
    num_buckets: int,
    add: Callable[[Any, Any], Any],
) -> CSRSparseMatrix:
    """Pre-aggregated one-row CSR for a single window (reference:
    create_csr.ts `create_csr_cpu`): after clustering, each bucket appears at
    most once, so the matrix is a single row over bucket columns."""
    clusters = precompute_with_cluster_method(chunks, len(points))
    vals, chunk_vals = pre_aggregate(points, clusters, add)
    order = sorted(range(len(vals)), key=lambda k: chunk_vals[k])
    data = [vals[k] for k in order]
    col_idx = [chunk_vals[k] - 1 for k in order]  # bucket b holds chunk b+1
    row_ptr = [0, len(data)]
    return CSRSparseMatrix(data, col_idx, row_ptr, num_buckets)
