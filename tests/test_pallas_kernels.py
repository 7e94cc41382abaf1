"""Unit tests for the Pallas production kernels, run in interpreter mode on
CPU against the python/jnp mirrors (the reference's debug-readback pattern,
reference: src/submission/submission.ts:892-1363)."""

import numpy as np

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


def test_pallas_pipeline_end_to_end_interpret():
    """Full Pallas MSM pipeline (sort -> gather -> segmented scan -> carry ->
    extraction -> BPR) at n=64/c=8 in jitted interpreter mode vs the python
    reference sum — default-CI coverage of ops/msm_pipeline's index plumbing
    without TPU hardware (the larger TPU-compiled runs live in
    test_pallas_tpu.py).  Jitted: interpret-mode kernels compile once (~4 min
    on CPU) and the run itself is sub-second."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.models import cuzk
    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
    from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig
    from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import horner

    n = 64
    pts, scalars = random_points_scalars(n, seed=7)
    scalars = list(scalars)
    scalars[3] = 0          # zero digits must sort to the sentinel tail
    coords, sc = cuzk.prepare_inputs([(p.x, p.y) for p in pts], scalars)
    cfg = MsmConfig(chunk_size=8)
    fn = jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))
    rows = fn(jnp.asarray(coords), jnp.asarray(sc))
    wsums = packed_rows_to_extpoints(np.asarray(rows))
    total = horner(wsums, cfg.chunk_size)

    want = ExtPoint(0, 1, 0, 1)
    for p, s in zip(pts, scalars):
        want = want.add(p.mul(s))
    assert total.to_affine() == want.to_affine()


def test_pallas_pipeline_adversarial_skew_interpret():
    """All-equal scalars put every (window, point) entry in one bucket, so
    bucket runs span many K=64 fragments — the cross-fragment carry scan is
    the trickiest logic in the pipeline and random scalars rarely exercise it
    at CI sizes.  Reuses the exact shapes of the end-to-end test above, so
    the jitted interpret programs are already compiled in this process."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.models import cuzk
    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
    from webgpu_msm_twisted_edwards_tpu.utils.params import MsmConfig
    from webgpu_msm_twisted_edwards_tpu.cpu.mirrors import horner

    n = 64
    pts, _ = random_points_scalars(n, seed=7)
    s = 0x0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF0123456789ABCD
    scalars = [s] * n
    coords, sc = cuzk.prepare_inputs([(p.x, p.y) for p in pts], scalars)
    cfg = MsmConfig(chunk_size=8)
    fn = jax.jit(partial(MP.msm_window_sums, cfg=cfg, interpret=True))
    rows = fn(jnp.asarray(coords), jnp.asarray(sc))
    total = horner(packed_rows_to_extpoints(np.asarray(rows)), cfg.chunk_size)

    want = ExtPoint(0, 1, 0, 1)
    for p in pts:
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
    table, neg = (np.asarray(t) for t in
                  PC.build_table_pair(jnp.asarray(coords), interpret=True))
    from webgpu_msm_twisted_edwards_tpu.utils.params import EDWARDS_D

    for i, p in enumerate(pts):
        # Row layout: cached y-x, y+x, 2*d*t (neither plain x/y nor t — the
        # 7-product madd consumes the cached form directly).  Negated rows
        # swap the first two coords and negate 2*d*t.
        wants = ((p.y - p.x) % PARAMS.p, (p.y + p.x) % PARAMS.p,
                 2 * EDWARDS_D * p.x * p.y % PARAMS.p)
        nwants = (wants[1], wants[0], (PARAMS.p - wants[2]) % PARAMS.p)
        for rows, want3 in ((table, wants), (neg, nwants)):
            for ci, want_plain in enumerate(want3):
                got = sum(int(rows[i, ci * LIMBS + j]) << (j * W) for j in range(LIMBS))
                assert got % PARAMS.p == PARAMS.to_mont(want_plain), (i, ci)


def test_build_table_doubled_matches_pair_interpret():
    """The one-pass doubled-table kernel (build_table_doubled) is bitwise
    identical to concatenating build_table_pair's two outputs."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.models.cuzk import prepare_inputs
    from webgpu_msm_twisted_edwards_tpu.ops.pallas import convert as PC

    pts, _ = random_points_scalars(8, seed=15)
    coords, _ = prepare_inputs([p.to_affine() for p in pts], [0] * 8)
    rows, neg = PC.build_table_pair(jnp.asarray(coords), interpret=True)
    want = np.concatenate([np.asarray(rows), np.asarray(neg)], axis=0)
    got = np.asarray(PC.build_table_doubled(jnp.asarray(coords), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_scan_matches_gather_scan_interpret():
    """msm_scan_fused (VMEM-resident table + in-kernel row gather) must be
    bit-identical to msm_scan over pre-gathered rows."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS
    from webgpu_msm_twisted_edwards_tpu.utils.params import EDWARDS_D

    pts, _ = random_points_scalars(16, seed=21)
    table = np.zeros((32, PS.TWR), np.uint32)
    for i, p in enumerate(pts):
        dm = (p.y - p.x) % PARAMS.p
        sm = (p.y + p.x) % PARAMS.p
        td2 = 2 * EDWARDS_D * p.x * p.y % PARAMS.p
        for ci, v in enumerate((dm, sm, td2)):
            m = PARAMS.to_mont(v)
            for j in range(L):
                table[i, ci * L + j] = (m >> (W * j)) & PARAMS.mask
        # Pre-negated upper half: swap (y-x, y+x), negate 2*d*t — any valid
        # negated representation works for the equivalence check.
        for ci, v in enumerate((sm, dm, (PARAMS.p - td2) % PARAMS.p)):
            m = PARAMS.to_mont(v)
            for j in range(L):
                table[16 + i, ci * L + j] = (m >> (W * j)) & PARAMS.mask
    rng = np.random.default_rng(0)
    nf = 128
    pidx = rng.integers(0, 32, size=(PS.K, nf)).astype(np.int32)
    keys = np.sort(rng.integers(0, 6, size=(PS.K, nf)), axis=0).astype(np.int32)
    rows = jnp.asarray(table)[pidx.T.reshape(-1)].reshape(nf, PS.K, PS.TWR)
    a = np.asarray(PS.msm_scan(rows, jnp.asarray(keys), interpret=True))
    b = np.asarray(PS.msm_scan_fused(
        jnp.asarray(table), jnp.asarray(pidx), jnp.asarray(keys), interpret=True,
    ))
    assert (a == b).all()


def test_pret_scan_matches_msm_scan_interpret():
    """msm_scan_pret (limb-major pre-transposed input, the production
    layout) must be bit-identical to msm_scan on the row-major layout."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS

    rng = np.random.default_rng(3)
    nf, lblk = 128, 64
    rows = rng.integers(0, 1 << 13, size=(nf, PS.K, PS.TWR)).astype(np.uint32)
    keys = np.sort(rng.integers(0, 9, size=(PS.K, nf)), axis=0).astype(np.int32)
    a = np.asarray(PS.msm_scan(jnp.asarray(rows), jnp.asarray(keys),
                               interpret=True))
    rows_t = jnp.transpose(
        jnp.asarray(rows).reshape(nf // lblk, lblk, PS.K, PS.TWR)[:, :, :, :64],
        (0, 2, 3, 1),
    )
    b = np.asarray(PS.msm_scan_pret(rows_t, jnp.asarray(keys), interpret=True))
    assert (a == b).all()


def test_bucket_counts_matmul_interpret():
    """MXU one-hot histogram (ops/pallas/hist.py) vs np.bincount, including
    sentinel exclusion, empty buckets, and both dtype paths."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import hist as HG

    rng = np.random.default_rng(5)
    wg, n, nb = 3, 512, 256
    # Adversarial mix: clustered keys, empty buckets, sentinel (== nb) rows.
    keys = rng.integers(0, nb + 1, size=(wg, n)).astype(np.int32)
    keys[0, :100] = 7          # heavy cluster
    keys[1, :] = nb            # all sentinels -> all-zero counts
    for dtype in (jnp.bfloat16, jnp.float32, jnp.int8):
        got = np.asarray(
            HG.bucket_counts(jnp.asarray(keys), nb, lanes=128, dtype=dtype,
                             interpret=True)
        )
        for w in range(wg):
            want = np.bincount(keys[w][keys[w] < nb], minlength=nb)
            assert got[w].tolist() == want.tolist(), (dtype, w)


def test_bucket_counts_matches_searchsorted_derivation():
    """ends/counts from the histogram equal the searchsorted formulation on
    sorted keys (the round-2 production derivation)."""
    import jax
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import hist as HG

    rng = np.random.default_rng(6)
    wg, n, nb = 2, 1024, 128
    keys = np.sort(rng.integers(0, nb + 1, size=(wg, n)).astype(np.int32), axis=1)
    counts = np.asarray(HG.bucket_counts(jnp.asarray(keys), nb, interpret=True))
    ends = np.cumsum(counts, axis=1) - 1
    queries = jnp.arange(nb + 1, dtype=jnp.int32)
    offsets = np.asarray(jax.vmap(
        lambda row: jnp.searchsorted(row, queries, side="left")
    )(jnp.asarray(keys)))
    assert (counts == offsets[:, 1:] - offsets[:, :nb]).all()
    assert (ends == offsets[:, 1:] - 1).all()


def test_msm_scan_rm_sames_matches_msm_scan_interpret():
    """Row-major + hoisted-mask scan (msm_scan_rm_sames) is bitwise identical
    to the in-kernel-compare row-major scan on the same rows/keys."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS

    rng = np.random.default_rng(13)
    nf = 128
    rows = rng.integers(0, PARAMS.mask + 1, size=(nf, PS.K, PS.TWR)).astype(np.uint32)
    keys = np.sort(rng.integers(0, 9, size=(PS.K, nf)), axis=0).astype(np.int32)
    a = np.asarray(PS.msm_scan(jnp.asarray(rows), jnp.asarray(keys), interpret=True))
    sames = PS.keys_to_sames(jnp.asarray(keys))
    b = np.asarray(PS.msm_scan_rm_sames(jnp.asarray(rows), sames, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_msm_scan_sames_matches_pret_interpret():
    """The hoisted same-segment-mask scan (msm_scan_sames + keys_to_sames)
    is bitwise identical to the in-kernel-compare pret scan on the same
    rows/keys.  Fragments never straddle windows in production (window runs
    are multiples of K), so forcing row 0 of the mask to zero matches the
    kprev = -1 fragment reset exactly."""
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.ops.pallas import scan as PS

    rng = np.random.default_rng(11)
    nfb, lblk = 2, 8
    nf = nfb * lblk
    # Realistic 13-bit limb data in the x/y/dt columns, zero padding cols.
    rows_t = np.zeros((nfb, PS.K, 64, lblk), dtype=np.uint32)
    rows_t[:, :, : 3 * L, :] = rng.integers(
        0, PARAMS.mask + 1, size=(nfb, PS.K, 3 * L, lblk), dtype=np.uint32
    )
    # Sorted keys per fragment column with plenty of duplicates.
    keys = np.sort(rng.integers(0, 7, size=(PS.K, nf)), axis=0).astype(np.int32)

    pret = PS.msm_scan_pret(jnp.asarray(rows_t), jnp.asarray(keys), interpret=True)
    sames = PS.keys_to_sames(jnp.asarray(keys))
    got = PS.msm_scan_sames(jnp.asarray(rows_t), sames, interpret=True)
    np.testing.assert_array_equal(np.asarray(pret), np.asarray(got))
