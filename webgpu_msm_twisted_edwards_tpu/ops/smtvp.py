"""Device SMTVP experiment: sort-free bucket accumulation by scatter.

Capability parity with the reference's SMTVP experiment (reference:
src/submission/miscellaneous/wgsl/smtvp.template.wgsl:1-59 — one GPU thread
per CSR row scatter-adding its point into bucket[col] — driven by
miscellaneous/cuzk/smtvp_wgsl.ts:29-203).  The reference measured SMTVP
against transpose+SMVP and shipped SMVP.

On TPU the same idea is structurally hostile: EC bucket accumulation is a
*group* operation, so XLA's scatter-add (integer/float only) cannot express
it, and a faithful scatter must serialize collisions.  The honest device
formulation below is a `fori_loop` over points that EC-adds each point into a
resident [nb, L]-per-coordinate bucket array via dynamic_update_slice — one
sequential device step per (point, window), batch width 1, so the VPU runs
at ~1/128 lane occupancy on top of the serialization.

Measured on v5e (see docs/DESIGN.md §6 and `benchmarks smtvp`): ~3 orders of
magnitude slower than the production sorted-segmented-scan pipeline, which
performs the identical W*n group additions at full lane occupancy.  Kept as
a benchmarked experiment, exactly like the reference kept smtvp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.params import PARAMS, MsmConfig
from . import curve as C
from . import field as F


@partial(jax.jit, static_argnames=("nb",))
def smtvp_buckets(points: C.PointXYTZ, digits_w: jnp.ndarray, nb: int) -> C.PointXYTZ:
    """Scatter one window's signed digits into nb buckets sequentially.

    points: PointXYTZ of [n, L] limb arrays (Montgomery form, z = R);
    digits_w: [n] signed digits for one window.  Returns [nb, L] bucket sums
    (bucket b = sum of points with |digit| == b+1, sign applied) — the same
    contract as the production pipeline's bucket stage.
    """
    n = digits_w.shape[0]
    nw = PARAMS.num_words
    ident = C.identity((nb,))
    bx, by, bt, bz = ident.x, ident.y, ident.t, ident.z

    def body(i, st):
        bx, by, bt, bz = st
        d = digits_w[i]
        neg = d < 0
        b = jnp.where(d == 0, 0, jnp.abs(d) - 1)
        px = lax.dynamic_slice(points.x, (i, 0), (1, nw))
        py = lax.dynamic_slice(points.y, (i, 0), (1, nw))
        pt = lax.dynamic_slice(points.t, (i, 0), (1, nw))
        pz = lax.dynamic_slice(points.z, (i, 0), (1, nw))
        # Signed bucket: negate x, t for negative digits.
        px = jnp.where(neg, F.neg(px), px)
        pt = jnp.where(neg, F.neg(pt), pt)
        cur = C.PointXYTZ(
            lax.dynamic_slice(bx, (b, 0), (1, nw)),
            lax.dynamic_slice(by, (b, 0), (1, nw)),
            lax.dynamic_slice(bt, (b, 0), (1, nw)),
            lax.dynamic_slice(bz, (b, 0), (1, nw)),
        )
        s = C.add(cur, C.PointXYTZ(px, py, pt, pz))
        keep = d == 0
        upd = lambda arr, new, old: lax.dynamic_update_slice(
            arr, jnp.where(keep, old, new), (b, 0)
        )
        return (
            upd(bx, s.x, cur.x),
            upd(by, s.y, cur.y),
            upd(bt, s.t, cur.t),
            upd(bz, s.z, cur.z),
        )

    bx, by, bt, bz = lax.fori_loop(0, n, body, (bx, by, bt, bz))
    return C.PointXYTZ(bx, by, bt, bz)


def smtvp_window_sums(coords_u32, scalars_u32, cfg: MsmConfig):
    """Full SMTVP-based MSM window sums (experiment; use the production
    pipeline for real work).  Returns [W] window-sum points like
    models.cuzk.msm_window_sums_device."""
    from . import bpr as BPR
    from . import convert as CV

    xm, ym, tm = CV.points_to_mont_limbs(coords_u32, PARAMS)
    n = coords_u32.shape[0]
    z = jnp.broadcast_to(F.r_limbs(), xm.shape)
    pts = C.PointXYTZ(xm, ym, tm, z)
    digits = CV.decompose_scalars_signed(scalars_u32, cfg)     # [n, W]
    rows = []
    for w in range(cfg.num_windows):
        rows.append(smtvp_buckets(pts, digits[:, w], cfg.num_buckets))
    buckets = C.PointXYTZ(
        jnp.stack([r.x for r in rows]),
        jnp.stack([r.y for r in rows]),
        jnp.stack([r.t for r in rows]),
        jnp.stack([r.z for r in rows]),
    )
    return BPR.reduce_buckets(buckets, num_chunks=min(256, cfg.num_buckets), params=PARAMS)
