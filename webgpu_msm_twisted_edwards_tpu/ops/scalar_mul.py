"""Batched scalar-multiplication strategies: double-and-add vs Booth recoding.

Capability parity with the reference's scalar-mul experiments
(reference: src/submission/miscellaneous/scalar_mul_benchmarks.ts —
double_and_add at :169, booth at :281-337, and
miscellaneous/wgsl/scalar_mul.template.wgsl; conclusion README.md:487-495:
Booth lost on random scalars, kept as an experiment).  Batched jnp over the
XLA curve ops; all lanes process all bits with selects (no divergence).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.params import PARAMS, FieldParams
from . import curve as C


@partial(jax.jit, static_argnames=("num_bits", "params"))
def double_and_add(p: C.PointXYTZ, k: jnp.ndarray, num_bits: int = 256,
                   params: FieldParams = PARAMS) -> C.PointXYTZ:
    """MSB-first double-and-add; k is [..., 8] uint32 LE words
    (reference analogue: scalar_mul_benchmarks.ts:169)."""
    acc0 = C.identity(p.batch_shape, params)

    def body(i, acc):
        bit = num_bits - 1 - i
        word = bit // 32
        off = jnp.uint32(bit % 32)
        take = ((k[..., word] >> off) & jnp.uint32(1)) == 1
        acc = C.double(acc, params)
        return C.select(take, C.add(acc, p, params), acc)

    return jax.lax.fori_loop(0, num_bits, body, acc0)


@partial(jax.jit, static_argnames=("num_bits", "params"))
def booth(p: C.PointXYTZ, k: jnp.ndarray, num_bits: int = 256,
          params: FieldParams = PARAMS) -> C.PointXYTZ:
    """Booth (signed-binary) recoding: digit_i = b_{i-1} - b_i over the bits
    of k, so runs of 1s become one add and one subtract
    (reference analogue: scalar_mul_benchmarks.ts:281-337 `booth`).

    k*P = sum_{i=0}^{num_bits} (b_{i-1} - b_i) * 2^i * P  (b_{-1} = 0,
    b_{num_bits} = 0): the two bit planes telescope to 2k - k = k."""
    from jax import lax

    neg_p = C.negate(p, params)

    # Precompute digit planes [batch..., num_bits+1].
    def bit_plane(shift):
        cols = []
        for i in range(num_bits + 1):
            j = i + shift
            if 0 <= j < num_bits:
                word = j // 32
                off = jnp.uint32(j % 32)
                cols.append(((k[..., word] >> off) & jnp.uint32(1)) == 1)
            else:
                cols.append(jnp.zeros(k.shape[:-1], dtype=jnp.bool_))
        return jnp.stack(cols, axis=-1)

    b_i = bit_plane(0)
    b_im1 = bit_plane(-1)
    plus = b_im1 & ~b_i
    minus = b_i & ~b_im1

    acc0 = C.identity(p.batch_shape, params)

    def body(step, acc):
        i = num_bits - step  # MSB-first digit position
        acc = C.double(acc, params)
        pl = lax.dynamic_index_in_dim(plus, i, axis=-1, keepdims=False)
        mi = lax.dynamic_index_in_dim(minus, i, axis=-1, keepdims=False)
        acc = C.select(pl, C.add(acc, p, params), acc)
        acc = C.select(mi, C.add(acc, neg_p, params), acc)
        return acc

    return lax.fori_loop(0, num_bits + 1, body, acc0)
