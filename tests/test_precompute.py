"""Fixed-base (precomputed-SRS) MSM path: field inversion, the window-shift
doubling chain, and the merged single-window pipeline vs the python ground
truth (ops/precompute.py; beyond-parity capability — the reference has only
the one-shot compute_msm, reference: src/submission/submission.ts:73-78)."""

import dataclasses
import random

import jax.numpy as jnp
import numpy as np

from webgpu_msm_twisted_edwards_tpu.cpu.curve import naive_msm
from webgpu_msm_twisted_edwards_tpu.cpu.field import finv
from webgpu_msm_twisted_edwards_tpu.models import cuzk
from webgpu_msm_twisted_edwards_tpu.ops import field as F
from webgpu_msm_twisted_edwards_tpu.ops import precompute as PRE
from webgpu_msm_twisted_edwards_tpu.utils import limbs as L
from webgpu_msm_twisted_edwards_tpu.utils.params import PARAMS, MsmConfig

from conftest import random_points_scalars


def _limbs(v: int) -> np.ndarray:
    w, m = PARAMS.word_size, PARAMS.mask
    return np.asarray([(v >> (w * i)) & m for i in range(PARAMS.num_words)],
                      dtype=np.uint32)


def _from_limbs(a: np.ndarray) -> int:
    w = PARAMS.word_size
    return sum(int(x) << (w * i) for i, x in enumerate(a))


def test_mont_inv_matches_fermat():
    r = random.Random(5)
    vals = [r.randrange(1, PARAMS.p) for _ in range(6)] + [0]
    xs = jnp.asarray(np.stack([_limbs(PARAMS.to_mont(v)) for v in vals]))
    inv = np.asarray(F.mont_inv(xs))
    for v, row in zip(vals, inv):
        got = PARAMS.from_mont(_from_limbs(row))
        want = finv(v) if v else 0
        assert got == want, v


def test_mont_inv_batch_matches_elementwise():
    r = random.Random(6)
    vals = [r.randrange(1, PARAMS.p) for _ in range(9)]
    vals[3] = 0                      # zero must not poison the batch
    xs = jnp.asarray(np.stack([_limbs(PARAMS.to_mont(v)) for v in vals]))
    got = np.asarray(F.mont_inv_batch(xs))
    want = np.asarray(F.mont_inv(xs))
    assert (got == want).all()


def test_scalar_bits_drops_windows():
    """253-bit coverage (scalars < subgroup order) drops a window for
    c in 17..21 while keeping the W'*c >= 253 carry-safety bound."""
    for c, w in [(16, 16), (17, 15), (18, 15), (19, 14), (20, 13)]:
        cfg = MsmConfig(chunk_size=c, scalar_bits=253)
        assert cfg.num_windows == w, (c, cfg.num_windows)
        assert cfg.num_windows * c >= 253
    assert MsmConfig(chunk_size=16).num_windows == 16   # default unchanged


def test_shifted_base_coords_vs_cpu():
    """Window j of the precomputed set must equal 2^(c*j) * P_i."""
    pts, _ = random_points_scalars(4, seed=91)
    coords = np.stack(
        [L.ints_to_u32_words([p.x for p in pts]),
         L.ints_to_u32_words([p.y for p in pts])], axis=1)
    c = 50                      # few windows keep the chain short: W' = 6
    cfg = MsmConfig(chunk_size=c, scalar_bits=253)
    merged = np.asarray(PRE.shifted_base_coords(jnp.asarray(coords), cfg))
    assert merged.shape == (cfg.num_windows * 4, 2, 8)
    for j in range(cfg.num_windows):
        for i, p in enumerate(pts):
            want = p.mul(1 << (c * j)).to_affine()
            row = merged[j * 4 + i]
            got = (L.words_le_to_int(row[0].astype(np.uint64), 32),
                   L.words_le_to_int(row[1].astype(np.uint64), 32))
            assert got == want, (j, i)


def _precompute_inputs(n, seed):
    pts, scalars = random_points_scalars(n, seed=seed)
    coords = np.stack(
        [L.ints_to_u32_words([p.x for p in pts]),
         L.ints_to_u32_words([p.y for p in pts])], axis=1)
    sc = L.ints_to_u32_words(scalars)
    return pts, scalars, jnp.asarray(coords), jnp.asarray(sc)


def test_fixed_base_total_interpret():
    """Merged single-window pipeline end-to-end (interpret mode) vs the
    python naive MSM, including the blocked-entry streaming variant (the
    table_base path) which must give the identical group element."""
    pts, scalars, coords, sc = _precompute_inputs(64, seed=93)
    cfg = MsmConfig(chunk_size=8, scalar_bits=253)
    pre = PRE.precompute_fixed_base(coords, cfg, interpret=True)
    assert pre.cfg.num_windows == 32
    rows = np.asarray(PRE.fixed_base_total_rows(pre, sc, interpret=True))
    got = cuzk.packed_rows_to_extpoints(rows)[0].to_affine()
    want = naive_msm(pts, scalars).to_affine()
    assert got == want

    # Blocked: same result streamed as 2 entry blocks through the shared
    # per-block program (partial bucket arrays EC-add).
    pre2 = dataclasses.replace(pre, nblk=1024, blocks=2)
    rows2 = np.asarray(PRE.fixed_base_total_rows(pre2, sc, interpret=True))
    got2 = cuzk.packed_rows_to_extpoints(rows2)[0].to_affine()
    assert got2 == want


def test_compute_msm_precomputed_api():
    """Public API wrappers: precompute_msm_base + compute_msm_precomputed
    pad/reduce like compute_msm and agree with it."""
    pts, scalars = random_points_scalars(48, seed=95)
    aff = [(p.x, p.y) for p in pts]
    # Keep the padded size tiny for interpret mode by driving the ops layer
    # through the public scalar prep (pad target is 4096 in production; the
    # API test exercises prep + decode around a hand-built small context).
    _, _, coords, _ = _precompute_inputs(48, seed=95)
    coords_p = cuzk._pad_points(np.asarray(coords), 64 - 48)
    cfg = MsmConfig(chunk_size=8, scalar_bits=253)
    pre = PRE.precompute_fixed_base(jnp.asarray(coords_p), cfg, interpret=True)
    got = cuzk.compute_msm_precomputed(pre, scalars, interpret=True)
    want = naive_msm(pts, scalars).to_affine()
    assert (got["x"], got["y"]) == want

    batch = cuzk.compute_msm_batch_precomputed(
        pre, [scalars, [1] * 48], interpret=True)
    assert (batch[0]["x"], batch[0]["y"]) == want
    want1 = naive_msm(pts, [1] * 48).to_affine()
    assert (batch[1]["x"], batch[1]["y"]) == want1


def test_default_entry_block_derivation():
    from unittest import mock

    with mock.patch(
        "webgpu_msm_twisted_edwards_tpu.utils.runtime.device_memory_bytes",
        return_value=16 * (1 << 30),
    ):
        # 2^20 * 16 windows: ~8.6 GB table leaves ~5 GB staging -> blocks.
        n_entries = 16 * (1 << 20)
        table_bytes = n_entries * 128 * 4
        nblk, blocks = PRE.default_entry_block(n_entries, table_bytes)
        assert blocks >= 2 and nblk % PRE._BLK_UNIT == 0
        assert nblk * blocks >= n_entries
        assert nblk * 1300 + table_bytes <= 0.85 * 16 * (1 << 30) + 1300 * PRE._BLK_UNIT
        # Small case fits in one block.
        nblk, blocks = PRE.default_entry_block(16 * (1 << 14), 16 * (1 << 14) * 512)
        assert blocks == 1
