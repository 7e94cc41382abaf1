"""Stages 2+3: sorted signed-bucket accumulation (transpose + SMVP re-design).

The reference builds a CSC sparse matrix per window with an atomics-based
serial transpose (reference: wgsl/cuzk/transpose.wgsl:34-74) and then runs one
thread per bucket gathering its points (SMVP,
reference: wgsl/cuzk/smvp.template.wgsl:60-149).

On TPU both stages collapse into one idiomatic XLA formulation with static
shapes and no atomics:

1.  Per window, sort (bucket_key, point_index, sign) by key — `lax.sort` is
    the parallel replacement for the histogram/prefix-sum/scatter transpose.
2.  Bucket start offsets and counts come from a vectorized `searchsorted`
    (the CSC col_ptr analogue).
3.  Bucket sums are accumulated *layer by layer*: iteration j gathers the j-th
    point of every bucket of every window at once — a [num_windows *
    num_buckets]-lane masked EC add — running `max(count)` iterations in a
    `lax.while_loop`.  Load imbalance across buckets costs only
    (max-mean) extra layers instead of serializing whole buckets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.params import PARAMS, FieldParams, MsmConfig
from . import curve as C


class SortedBuckets(NamedTuple):
    """Per-window sorted bucket layout (the CSC analogue)."""

    #: [W, n] bucket keys in ascending order; key == num_buckets is the
    #: sentinel for zero digits (discarded).
    keys: jnp.ndarray
    #: [W, n] original point index of each sorted entry.
    point_idx: jnp.ndarray
    #: [W, n] +1 / -1 digit sign of each sorted entry (int32).
    sign: jnp.ndarray
    #: [W, NB] start offset of each bucket in the sorted order.
    starts: jnp.ndarray
    #: [W, NB] number of points in each bucket.
    counts: jnp.ndarray


def sort_buckets(digits: jnp.ndarray, cfg: MsmConfig) -> SortedBuckets:
    """[n, W] signed digits -> per-window sorted bucket layout.

    Bucket key for digit d != 0 is |d| - 1 (so keys span exactly
    [0, 2^(c-1))); zero digits get the sentinel key NB and sort to the end.
    """
    nb = cfg.num_buckets
    n = digits.shape[0]
    d = digits.T  # [W, n]
    sign = jnp.where(d < 0, jnp.int32(-1), jnp.int32(1))
    keys = jnp.where(d == 0, jnp.int32(nb), jnp.abs(d) - 1)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], keys.shape)
    keys_s, idx_s, sign_s = lax.sort((keys, idx, sign), dimension=1, num_keys=1)

    queries = jnp.arange(nb + 1, dtype=jnp.int32)
    offsets = jax.vmap(lambda row: jnp.searchsorted(row, queries, side="left"))(keys_s)
    starts = offsets[:, :nb]
    counts = offsets[:, 1:] - offsets[:, :nb]
    return SortedBuckets(keys_s, idx_s, sign_s, starts, counts)


def accumulate_buckets(
    points: C.PointXYTZ,
    sb: SortedBuckets,
    params: FieldParams = PARAMS,
) -> C.PointXYTZ:
    """Layered masked gather-fold: returns per-bucket EC sums, batch shape
    [W, NB] (signed contributions already applied).

    `points` is the [n]-batch Montgomery-form point table (z == R for affine
    inputs).  The loop runs max(counts) iterations — a traced bound, so no
    recompilation across inputs.
    """
    wdim, nb = sb.starts.shape
    n = sb.point_idx.shape[1]
    max_count = jnp.max(sb.counts)

    acc0 = C.identity((wdim, nb), params)

    def cond(state):
        j, _ = state
        return j < max_count

    def body(state):
        j, acc = state
        pos = sb.starts + j  # [W, NB]
        valid = j < sb.counts
        safe = jnp.minimum(pos, n - 1)
        pidx = jnp.take_along_axis(sb.point_idx, safe, axis=1)  # [W, NB]
        sgn = jnp.take_along_axis(sb.sign, safe, axis=1)
        pt = C.gather(points, pidx)  # [W, NB, limbs]
        pt = C.select(sgn < 0, C.negate(pt, params), pt)
        acc = C.add_masked(acc, pt, valid, params)
        return j + 1, acc

    _, acc = lax.while_loop(cond, body, (jnp.int32(0), acc0))
    return acc
