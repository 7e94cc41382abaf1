"""Unit tests for the Pallas production kernels, run in interpreter mode on
CPU against the python/jnp mirrors (the reference's debug-readback pattern,
reference: src/submission/submission.ts:892-1363)."""

import numpy as np
import pytest

from conftest import random_points_scalars
from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
from webgpu_msm_twisted_edwards_tpu.models.cuzk import packed_rows_to_extpoints
from webgpu_msm_twisted_edwards_tpu.ops.pallas.common import LP, L, W
from webgpu_msm_twisted_edwards_tpu.utils.params import PARAMS


def pack_point_row(p: ExtPoint, tw: int = 64) -> np.ndarray:
    """ExtPoint (plain ints) -> packed Montgomery row (x, y, t, z)."""
    row = np.zeros(tw, dtype=np.uint32)
    for ci, v in enumerate((p.x, p.y, p.t, p.z)):
        m = PARAMS.to_mont(v)
        limbs = [(m >> (i * W)) & PARAMS.mask for i in range(L)]
        for i in range(LP):
            lo = limbs[2 * i]
            hi = limbs[2 * i + 1] if 2 * i + 1 < L else 0
            row[ci * LP + i] = lo | (hi << 16)
    return row


def rows_equal_points(rows: np.ndarray, pts: list[ExtPoint]) -> bool:
    got = packed_rows_to_extpoints(np.asarray(rows))
    return all(g.to_affine() == p.to_affine() for g, p in zip(got, pts))


def test_masked_add_rows_interpret():
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas.ec import masked_add_rows

    pts, _ = random_points_scalars(16, seed=5)
    a = np.stack([pack_point_row(p) for p in pts[:8]])
    b = np.stack([pack_point_row(p) for p in pts[8:]])
    mask = np.array([1, 0, 1, 1, 0, 1, 0, 1], dtype=np.int32)
    out = masked_add_rows(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
    want = [pa.add(pb) if m else pa for pa, pb, m in zip(pts[:8], pts[8:], mask)]
    assert rows_equal_points(out, want)


def test_seg_carry_scan_interpret():
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas.scan import seg_carry_scan
    from webgpu_msm_twisted_edwards_tpu.ops.msm_pipeline import identity_row_np

    pts, _ = random_points_scalars(8, seed=6)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, size=8).astype(np.int32)
    brows = np.stack([pack_point_row(p) for p in pts])
    out = seg_carry_scan(jnp.asarray(a), jnp.asarray(brows), kab=4, interpret=True)

    ident = ExtPoint(0, 1, 0, 1)
    want = []
    c = ident
    for i in range(8):
        want.append(c)
        c = (c if a[i] else ident).add(pts[i])
    assert rows_equal_points(out, want)


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="interpret-mode full pipeline is slow; set RUN_SLOW=1 (covered on TPU by test_pallas_tpu.py)",
)
def test_pallas_pipeline_small_interpret():
    """Full Pallas MSM pipeline at n=512 in interpreter mode vs the python
    reference sum."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.models import cuzk
    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
    from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig
    from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import horner

    n = 512
    pts, scalars = random_points_scalars(n, seed=7)
    coords, sc = cuzk.prepare_inputs([(p.x, p.y) for p in pts], scalars)
    cfg = MsmConfig(chunk_size=16)
    rows = MP.msm_window_sums(jnp.asarray(coords), jnp.asarray(sc), cfg, interpret=True)
    wsums = packed_rows_to_extpoints(np.asarray(rows))
    total = horner(wsums, cfg.chunk_size)

    want = ExtPoint(0, 1, 0, 1)
    for p, s in zip(pts, scalars):
        want = want.add(p.mul(s))
    assert total.to_affine() == want.to_affine()


def test_bpr_kernels_interpret():
    """BPR stage-1/stage-2/fold vs the CPU running-sum mirror at a tiny size
    (reference mirror: miscellaneous/bpr.ts)."""
    import jax.numpy as jnp
    import numpy as np

    from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint
    from webgpu_msm_twisted_edwards_tpu.ops.pallas.bpr import bpr

    w, nb = 2, 8
    pts, _ = random_points_scalars(w * nb, seed=13)
    rows = np.stack([pack_point_row(p) for p in pts])
    out = bpr(jnp.asarray(rows), num_windows=w, interpret=True)
    got = packed_rows_to_extpoints(np.asarray(out))
    for wi in range(w):
        want = ExtPoint(0, 1, 0, 1)
        m = ExtPoint(0, 1, 0, 1)
        bkts = pts[wi * nb:(wi + 1) * nb]
        for b in range(nb - 1, -1, -1):
            m = m.add(bkts[b])
            want = want.add(m)
        assert got[wi].to_affine() == want.to_affine(), wi


def test_convert_kernel_interpret():
    """Pallas convert kernel vs host Montgomery conversion (reference
    analogue: the stage-1 debug check, submission.ts:892-951)."""
    import jax.numpy as jnp
    import numpy as np

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import convert as PC
    from webgpu_msm_twisted_edwards_tpu.ops.pallas.common import L as LIMBS
    from webgpu_msm_twisted_edwards_tpu.models.cuzk import prepare_inputs

    pts, _ = random_points_scalars(8, seed=14)
    coords, _ = prepare_inputs([p.to_affine() for p in pts], [0] * 8)
    table = np.asarray(PC.build_table(jnp.asarray(coords), interpret=True))
    for i, p in enumerate(pts):
        for ci, want_plain in enumerate((p.x, p.y, p.x * p.y % PARAMS.p)):
            got = sum(int(table[i, ci * LIMBS + j]) << (j * W) for j in range(LIMBS))
            assert got % PARAMS.p == PARAMS.to_mont(want_plain), (i, ci)
        # column 3 holds d*t in Montgomery form
        from webgpu_msm_twisted_edwards_tpu.utils.params import EDWARDS_D

        got = sum(int(table[i, 3 * LIMBS + j]) << (j * W) for j in range(LIMBS))
        assert got % PARAMS.p == PARAMS.to_mont(EDWARDS_D * p.x * p.y % PARAMS.p)
