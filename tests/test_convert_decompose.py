"""Stage-1 kernel tests: limb conversion + Montgomery entry + signed scalar
decomposition vs the CPU mirrors — the analogue of the reference's stage-1
debug validator (reference: submission.ts:892-951)."""

import random

import jax.numpy as jnp
import numpy as np

from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import decompose_scalars_signed as cpu_decompose
from webgpu_msm_twisted_edwards_tpu.ops import convert as CV
from webgpu_msm_twisted_edwards_tpu.utils import limbs as L
from webgpu_msm_twisted_edwards_tpu.utils.params import P, PARAMS, MsmConfig, SUBGROUP_ORDER

from conftest import random_points_scalars


def test_u32_words_to_limbs_roundtrip():
    r = random.Random(21)
    vals = [r.randrange(P) for _ in range(32)] + [0, 1, P - 1]
    words = jnp.asarray(L.ints_to_u32_words(vals))
    limbs = CV.u32_words_to_limbs(words)
    assert L.limbs_to_ints(np.asarray(limbs)) == vals
    back = CV.limbs_to_u32_words(limbs)
    assert L.u32_words_to_ints(np.asarray(back)) == vals


def test_points_to_mont_limbs():
    pts, _ = random_points_scalars(8, seed=22)
    coords = np.stack(
        [L.ints_to_u32_words([p.x for p in pts]), L.ints_to_u32_words([p.y for p in pts])],
        axis=1,
    )
    xm, ym, tm = CV.points_to_mont_limbs(jnp.asarray(coords))
    assert L.limbs_to_ints(np.asarray(xm)) == [PARAMS.to_mont(p.x) for p in pts]
    assert L.limbs_to_ints(np.asarray(ym)) == [PARAMS.to_mont(p.y) for p in pts]
    assert L.limbs_to_ints(np.asarray(tm)) == [PARAMS.to_mont(p.x * p.y % P) for p in pts]


def test_decompose_signed_matches_cpu_mirror():
    r = random.Random(23)
    scalars = [r.randrange(SUBGROUP_ORDER) for _ in range(128)] + [0, 1, SUBGROUP_ORDER - 1]
    for c in (16, 4):
        cfg = MsmConfig(chunk_size=c)
        want = cpu_decompose(scalars, cfg.num_windows, c)
        words = jnp.asarray(L.ints_to_u32_words(scalars))
        got = np.asarray(CV.decompose_scalars_signed(words, cfg))
        assert got.shape == (len(scalars), cfg.num_windows)
        assert got.tolist() == want


def test_decompose_signed_narrow_scalar_bits():
    """c=17 over scalar_bits=255 covers every subgroup scalar in 15 windows
    (the final signed carry is 0 because the top raw window of a < 2^253
    scalar is < 2^15 < half) — the configuration probed in
    experiments/c17_probe.py.  Reconstruction must be exact."""
    r = random.Random(24)
    scalars = [r.randrange(SUBGROUP_ORDER) for _ in range(128)] + [0, 1, SUBGROUP_ORDER - 1]
    cfg = MsmConfig(chunk_size=17, scalar_bits=255)
    assert cfg.num_windows == 15
    words = jnp.asarray(L.ints_to_u32_words(scalars))
    got = np.asarray(CV.decompose_scalars_signed(words, cfg)).astype(object)
    rebuilt = [
        int(sum(int(d) << (17 * j) for j, d in enumerate(row))) for row in got
    ]
    assert rebuilt == scalars
    assert int(np.abs(got.astype(np.int64)).max()) <= 1 << 16
