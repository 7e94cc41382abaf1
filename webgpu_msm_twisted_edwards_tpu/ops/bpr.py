"""Stage 4: parallel running-sum bucket reduction (BPR, cuZK Algorithm 4).

Computes, per window, S = sum_{b=1}^{NB} b * Bucket[b] from the [W, NB]
bucket-sum array, without a serial O(NB) chain.

TPU re-design of the reference's two-entry-point shader
(reference: wgsl/cuzk/bpr.template.wgsl stage_1:75-124 and stage_2:126-171):

- stage 1: buckets are reshaped to [W, C, L] chunks; a `fori_loop` of L steps
  runs the running sums m (chunk total) and g (locally weighted sum) across
  all W*C chunk lanes at once.
- stage 2: the fix-up g += m * (chunk_base) runs as SIMD double-and-add
  (`curve.scale_u32`) over all chunk lanes.
- finally the C partial g's per window are combined with a log-depth EC tree
  reduction (the role the reference gives to its CPU summation loop,
  submission.ts:363-393).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..utils.params import PARAMS, FieldParams
from . import curve as C


def reduce_buckets(
    buckets: C.PointXYTZ,
    num_chunks: int = 256,
    params: FieldParams = PARAMS,
) -> C.PointXYTZ:
    """[W, NB] bucket sums -> [W] window sums, where bucket b (0-based) has
    weight b+1."""
    wdim, nb = buckets.batch_shape
    if num_chunks > nb:
        num_chunks = nb
    assert nb % num_chunks == 0, (nb, num_chunks)
    chunk_len = nb // num_chunks

    # [W, C, L, limbs] view of the bucket axis.
    def resh(a):
        return a.reshape(wdim, num_chunks, chunk_len, a.shape[-1])

    bk = C.PointXYTZ(resh(buckets.x), resh(buckets.y), resh(buckets.t), resh(buckets.z))

    # Stage 1: descending running sums within each chunk.
    m0 = C.identity((wdim, num_chunks), params)
    g0 = C.identity((wdim, num_chunks), params)

    def body(k, state):
        m, g = state
        # Process bucket index L-1-k within each chunk (descending).
        idx = chunk_len - 1 - k
        bpt = C.PointXYTZ(
            lax.dynamic_index_in_dim(bk.x, idx, axis=2, keepdims=False),
            lax.dynamic_index_in_dim(bk.y, idx, axis=2, keepdims=False),
            lax.dynamic_index_in_dim(bk.t, idx, axis=2, keepdims=False),
            lax.dynamic_index_in_dim(bk.z, idx, axis=2, keepdims=False),
        )
        m = C.add(m, bpt, params)
        g = C.add(g, m, params)
        return m, g

    m, g = lax.fori_loop(0, chunk_len, body, (m0, g0))

    # Stage 2: g_t += m_t * (t * chunk_len)  — local weights were 1..L, true
    # weights are t*L+1 .. (t+1)*L.
    chunk_base = (jnp.arange(num_chunks, dtype=jnp.uint32) * jnp.uint32(chunk_len))[None, :]
    chunk_base = jnp.broadcast_to(chunk_base, (wdim, num_chunks))
    num_bits = max(1, int(nb - chunk_len).bit_length())
    fix = C.scale_u32(m, chunk_base, num_bits, params)
    g = C.add(g, fix, params)

    # Combine chunk partials: [W, C] -> [W].
    return C.tree_reduce_axis(g, axis=1, params=params)
