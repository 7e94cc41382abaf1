"""Curve and limb parameters for the Twisted Edwards BLS12 ("Edwards BLS12",
ed-on-bls12-377) curve, and derivation of all Montgomery-arithmetic constants.

Capability parity with the reference implementation's parameter layer
(reference: src/submission/implementation/cuzk/params.ts:1-23 and
src/submission/implementation/cuzk/utils.ts:518-586 `compute_misc_params`),
re-derived independently for a TPU-native limb design.

The base field is the 253-bit prime
    p = 8444461749428370424248824938781546531375899335154063827935233455917409239041
and field elements are represented as NUM_WORDS little-endian limbs of
WORD_SIZE bits each, stored in uint32 lanes.  WORD_SIZE=13 is chosen so that a
limb product fits in 26 bits and the interleaved Montgomery product inner loop
can accumulate 2 products per limb per iteration for up to `nsafe` iterations
without carry propagation (reference analysis: README.md:374-396).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

# --- Curve constants (reference: src/reference/params/AleoConstants.ts:1-5) ---

#: Base field prime of the Twisted Edwards BLS12 curve (== scalar field of
#: BLS12-377).
P = 8444461749428370424248824938781546531375899335154063827935233455917409239041

#: Twisted Edwards `a` coefficient: a = -1 mod p.
EDWARDS_A = P - 1

#: Twisted Edwards `d` coefficient.
EDWARDS_D = 3021

#: Order of the prime-order subgroup (scalar field of the Edwards curve).
SUBGROUP_ORDER = 2111115437357092606062206234695386632838870926408408195193685246394721360383

#: Cofactor of the curve.
COFACTOR = 4

#: Affine generator of the prime-order subgroup
#: (reference: src/reference/utils/FieldMath.ts:105-137).
GENERATOR_X = 1540945439182663264862696551825005342995406165131907382295858612069623286213
GENERATOR_Y = 8003546896475222703853313610036801932325312921786952001586936882361378122196

#: Default limb width in bits.  See module docstring.
WORD_SIZE = 13

#: Number of bits in a scalar as presented at the API boundary (8 u32 words).
SCALAR_BITS = 256


def _egcd(a: int, b: int) -> tuple[int, int, int]:
    """Extended gcd: returns (g, x, y) with a*x + b*y = g."""
    old_r, r = a, b
    old_s, s = 1, 0
    old_t, t = 0, 1
    while r != 0:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
        old_t, t = t, old_t - q * t
    return old_r, old_s, old_t


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """All derived constants for limb-based Montgomery arithmetic.

    Mirrors the capability of `compute_misc_params`
    (reference: src/submission/implementation/cuzk/utils.ts:518-586).
    """

    p: int
    word_size: int
    num_words: int
    #: Maximum number of product terms in a schoolbook multiply.
    max_terms: int
    #: How many w-bit x w-bit products fit in a u32 accumulator.
    k: int
    #: Number of carry-free inner-loop iterations of the Montgomery product
    #: (2 products accumulated per iteration), floor(k/2).
    nsafe: int
    #: -p^-1 mod 2^word_size.
    n0: int
    #: Montgomery radix R = 2^(num_words*word_size) reduced mod p.
    r: int
    #: R^-1 mod p.
    rinv: int
    #: R^2 mod p — multiply by this (Montgomery product) to enter Montgomery form.
    r2: int
    #: Edwards d in Montgomery form: d*R mod p.
    edwards_d_mont: int
    #: Barrett-Domb m constant (2^(2*p_width+z) // p), kept for parity with the
    #: reference's explored Barrett-Domb path (utils.ts:566-569).
    barrett_domb_m: int
    #: Limb mask 2^word_size - 1.
    mask: int

    @property
    def r_full(self) -> int:
        """Unreduced Montgomery radix 2^(num_words*word_size)."""
        return 1 << (self.num_words * self.word_size)

    def to_mont(self, x: int) -> int:
        return (x * self.r_full) % self.p

    def from_mont(self, x: int) -> int:
        return (x * self.rinv) % self.p


@lru_cache(maxsize=None)
def compute_field_params(p: int = P, word_size: int = WORD_SIZE) -> FieldParams:
    """Derive Montgomery/limb constants for prime `p` and the given limb width.

    Capability mirror of reference utils.ts:518-586; derivation is independent
    (plain extended gcd instead of bigint-crypto-utils).
    """
    assert word_size > 0
    p_width = p.bit_length()
    num_words = -(-p_width // word_size)  # ceil
    max_terms = num_words * 2

    # Largest k with k * 2^(2w) <= 2^32 (how many products a u32 can accumulate).
    k = (1 << 32) // (1 << (2 * word_size))
    nsafe = k // 2

    r_full = 1 << (num_words * word_size)
    g, rinv, pprime = _egcd(r_full, p)
    assert g == 1
    rinv %= p
    # -p^-1 mod r_full:
    neg_p_inv = (-pprime) % r_full
    n0 = neg_p_inv % (1 << word_size)
    assert (p * (r_full - neg_p_inv)) % r_full == 1 or (p * (-neg_p_inv % r_full)) % r_full == 1

    z = num_words * word_size - p_width
    barrett_domb_m = (1 << (2 * p_width + z)) // p

    return FieldParams(
        p=p,
        word_size=word_size,
        num_words=num_words,
        max_terms=max_terms,
        k=k,
        nsafe=nsafe,
        n0=n0,
        r=r_full % p,
        rinv=rinv,
        r2=(r_full * r_full) % p,
        edwards_d_mont=(EDWARDS_D * r_full) % p,
        barrett_domb_m=barrett_domb_m,
        mask=(1 << word_size) - 1,
    )


#: The default parameter set (w=13, 20 limbs), matching the reference's chosen
#: design point (reference: params.ts:16-22; num_words=20, nsafe=32, n0=8191).
PARAMS = compute_field_params()
NUM_WORDS = PARAMS.num_words


@dataclasses.dataclass(frozen=True)
class MsmConfig:
    """Static configuration of one MSM pipeline instance.

    Mirrors the sizing logic of the reference orchestrator
    (reference: src/submission/submission.ts:79-142): window size
    (`chunk_size`) is 16 for n >= 2^16 and smaller for small inputs, giving
    `num_windows` signed windows over the 256-bit scalar.
    """

    chunk_size: int = 16
    #: Bits of scalar the window decomposition must cover.  The default (256)
    #: matches the reference's byte-oriented windowing (submission.ts:79-83);
    #: the fixed-base precomputed path narrows it to 253 (scalars are reduced
    #: below the subgroup order, utils/params.py:SUBGROUP_ORDER), which drops
    #: a whole window for c in 17..21 (ops/precompute.py).
    scalar_bits: int = SCALAR_BITS

    @property
    def num_windows(self) -> int:
        return -(-self.scalar_bits // self.chunk_size)

    @property
    def num_buckets(self) -> int:
        """Signed buckets per window, excluding the zero bucket: 2^(c-1)."""
        return 1 << (self.chunk_size - 1)


def default_msm_config(n: int) -> MsmConfig:
    """Window sizing per input size (reference: submission.ts:79-83)."""
    return MsmConfig(chunk_size=16 if n >= (1 << 16) else 4)


def tpu_msm_config(n: int) -> MsmConfig:
    """Window sizing for the TPU Pallas pipeline, from measured sweeps on
    v5e (`benchmarks sweep`): below 2^19 the fixed per-bucket machinery
    (BPR, extraction — all O(num_windows * 2^(c-1))) outweighs the extra
    scan work of more windows, so c=13 wins; from 2^19 the O(n * windows)
    scan/gather work dominates and c=16 wins.  Round-4 re-sweep after the
    DMA-engine gather (which cheapened the entry-linear side): crossover
    unchanged — 2^18: c=13 135.7 vs c=16 151.9 ms; 2^19: c=16 236.0 vs
    c=13 246.0; 2^21: c=16 807.0 vs c=15 917.1; 2^23 (streaming): c=16
    4433.8.  (Round 3: crossover moved 2^20 -> 2^19 when the MXU histogram
    + row-major layout removed most per-bucket glue.)  Wider windows lose
    the other way: c=17 over 255 scalar bits (15 windows, valid for
    subgroup-reduced scalars) measured 452.1 vs 416.6 ms at 2^20 — the
    O(W * 2^(c-1)) per-bucket machinery is 1.875x and not floor-dominated
    (experiments/c17_probe.py, MEASUREMENTS.md).  Re-sweep after any
    change to the fixed costs."""
    return MsmConfig(chunk_size=13 if n < (1 << 19) else 16)
