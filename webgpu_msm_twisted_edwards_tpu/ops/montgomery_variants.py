"""Montgomery-product variants across limb widths 12-16 — the limb-size study.

Re-creation of the reference's Montgomery benchmark suite (reference:
src/submission/implementation/wgsl/montgomery/mont_pro_optimised.template.wgsl,
mont_pro_modified.template.wgsl:27-63, mont_pro_cios.template.wgsl:31-102 and
the driver src/submission/miscellaneous/mont_mul_benchmarks.ts:27-242;
published results README.md:400-428).  Three algorithm families, chosen per
limb width by the carry-headroom constant nsafe = floor(2^32 / 2^(2w)) / 2:

- w <= 13 (nsafe >= num_words): fully carry-free interleaved product.
- w in {14, 15} (0 < nsafe < num_words): "modified" — carry sweeps every
  nsafe iterations.
- w == 16 (nsafe == 0): CIOS with immediate 16-bit hi/lo splitting (u32
  products of 16-bit limbs are exact; no u64 needed — TPU has none).

All functions are batch-first jnp over [..., L] uint32 limb-last arrays; these
are benchmark/parity implementations — the production path is the w=13 Pallas
kernel (ops/pallas/common.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.params import FieldParams, compute_field_params

U32 = jnp.uint32


def _p_limbs(params: FieldParams) -> np.ndarray:
    return np.array(
        [(params.p >> (i * params.word_size)) & params.mask for i in range(params.num_words)],
        dtype=np.uint32,
    )


def _cond_sub_p(limbs: list, params: FieldParams) -> list:
    pl = _p_limbs(params)
    L = params.num_words
    ge = jnp.ones_like(limbs[0], dtype=jnp.bool_)
    for i in range(L):
        pi = U32(int(pl[i]))
        ge = (limbs[i] > pi) | ((limbs[i] == pi) & ge)
    borrow = jnp.zeros_like(limbs[0])
    two_w = U32(1 << params.word_size)
    mask = U32(params.mask)
    out = []
    for i in range(L):
        d = limbs[i] + two_w - U32(int(pl[i])) - borrow
        borrow = U32(1) - (d >> params.word_size)
        out.append(jnp.where(ge, d & mask, limbs[i]))
    return out


def _sweep(limbs: list, params: FieldParams, extra: jnp.ndarray | None = None) -> tuple[list, jnp.ndarray]:
    """Carry-normalize a list of limb columns; returns (limbs, overflow)."""
    w = params.word_size
    mask = U32(params.mask)
    out = []
    c = jnp.zeros_like(limbs[0])
    for v in limbs:
        v = v + c
        out.append(v & mask)
        c = v >> w
    if extra is not None:
        c = c + extra
    return out, c


def mont_mul_optimised(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams) -> jnp.ndarray:
    """Carry-free interleaved product; requires nsafe >= num_words
    (reference: mont_pro_optimised / the production w=13 design)."""
    assert params.nsafe >= params.num_words
    return _mont_interleaved(x, y, params, sweep_every=0)


def mont_mul_modified(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams) -> jnp.ndarray:
    """Interleaved product with carry sweeps every nsafe iterations
    (reference: mont_pro_modified.template.wgsl:27-63)."""
    assert params.nsafe >= 1
    return _mont_interleaved(x, y, params, sweep_every=max(1, params.nsafe))


def _mont_interleaved(x, y, params, sweep_every: int) -> jnp.ndarray:
    L = params.num_words
    w = params.word_size
    mask = U32(params.mask)
    n0 = U32(params.n0)
    pl = _p_limbs(params)
    xs = [x[..., i] for i in range(L)]
    ys = [y[..., i] for i in range(L)]
    s = [jnp.zeros_like(xs[0]) for _ in range(L)]
    hi = jnp.zeros_like(xs[0])  # overflow beyond limb L-1 (value << w*L)
    for i in range(L):
        xi = xs[i]
        t = s[0] + xi * ys[0]
        qi = (n0 * (t & mask)) & mask
        u0 = t + qi * U32(int(pl[0]))
        c = u0 >> w
        ns = [s[j] + xi * ys[j] + qi * U32(int(pl[j])) for j in range(1, L)]
        ns[0] = ns[0] + c
        ns.append(hi)
        hi = jnp.zeros_like(xi)
        s = ns
        if sweep_every and (i + 1) % sweep_every == 0 and i + 1 < L:
            s, hi = _sweep(s, params)
    s, _ = _sweep(s, params)
    return jnp.stack(_cond_sub_p(s, params), axis=-1)


def mont_mul_cios(x: jnp.ndarray, y: jnp.ndarray, params: FieldParams) -> jnp.ndarray:
    """CIOS (Acar) with 16-bit limbs: every 16x16 product fits a u32 exactly,
    carries split immediately (reference: mont_pro_cios.template.wgsl:31-102).
    Works for any w <= 16 but pays per-step carry handling."""
    L = params.num_words
    w = params.word_size
    mask = U32(params.mask)
    n0 = U32(params.n0)
    pl = _p_limbs(params)
    xs = [x[..., i] for i in range(L)]
    ys = [y[..., i] for i in range(L)]
    t = [jnp.zeros_like(xs[0]) for _ in range(L + 2)]
    for i in range(L):
        xi = xs[i]
        c = jnp.zeros_like(xi)
        for j in range(L):
            cs = t[j] + xi * ys[j] + c
            t[j] = cs & mask
            c = cs >> w
        cs = t[L] + c
        t[L] = cs & mask
        t[L + 1] = cs >> w
        m = (t[0] * n0) & mask
        cs = t[0] + m * U32(int(pl[0]))
        c = cs >> w
        for j in range(1, L):
            cs = t[j] + m * U32(int(pl[j])) + c
            t[j - 1] = cs & mask
            c = cs >> w
        cs = t[L] + c
        t[L - 1] = cs & mask
        t[L] = t[L + 1] + (cs >> w)
        t[L + 1] = jnp.zeros_like(xi)
    return jnp.stack(_cond_sub_p(t[:L], params), axis=-1)


def mont_mul_for_width(w: int):
    """Returns (params, fn) with the algorithm family the reference's study
    picks for limb width w (reference: README.md:386-408)."""
    params = compute_field_params(word_size=w)
    if params.nsafe >= params.num_words:
        return params, partial(mont_mul_optimised, params=params)
    if params.nsafe >= 1:
        return params, partial(mont_mul_modified, params=params)
    return params, partial(mont_mul_cios, params=params)


def cost_loop(w: int, batch: int, chain: int):
    """The reference's cost-model benchmark: `chain` dependent Montgomery
    products per lane (reference: mont_mul_benchmarks.ts cost-loop a^COST*b).
    Returns a jitted fn (x, y) -> result for [batch, L] inputs."""
    params, fn = mont_mul_for_width(w)

    def run(x, y):
        # Rolled chain: one compiled product body regardless of chain length
        # (XLA compile time is the analogue of shader compile; keep it small).
        return jax.lax.fori_loop(0, chain, lambda _, r: fn(r, y), x)

    return params, jax.jit(run)
