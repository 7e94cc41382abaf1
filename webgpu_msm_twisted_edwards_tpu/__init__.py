"""TPU-native multi-scalar multiplication (MSM) framework for the Twisted
Edwards BLS12 curve (ed-on-bls12-377).

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the ZPrize
2023 "Beat the Best (WASM)" WebGPU submission (reference:
td-kwj-zp2023/webgpu-msm-twisted-edwards): a cuZK-style pipeline — signed
window decomposition, sorted bucket accumulation, parallel running-sum bucket
reduction — over 13-bit-limb Montgomery field arithmetic, scaled across chips
with jax.sharding.
"""

from .models.cuzk import (
    compute_msm,
    compute_msm_batch,
    compute_msm_batch_precomputed,
    compute_msm_precomputed,
    precompute_msm_base,
)
from .utils.params import EDWARDS_A, EDWARDS_D, P, PARAMS, SUBGROUP_ORDER, MsmConfig


def compute_msm_sharded(points, scalars, **kwargs):
    """Multi-device MSM (see parallel.sharded.compute_msm_sharded)."""
    from .parallel.sharded import compute_msm_sharded as _f

    return _f(points, scalars, **kwargs)


def compute_msm_batch_sharded(points, scalars_list, **kwargs):
    """Multi-device batch MSM: k MSMs over one point set, the batch axis
    sharded (see parallel.sharded.compute_msm_batch_sharded)."""
    from .parallel.sharded import compute_msm_batch_sharded as _f

    return _f(points, scalars_list, **kwargs)


def validate_pipeline(points, scalars, **kwargs):
    """Per-stage device-vs-mirror validation (see ops.debug.validate_pipeline)."""
    from .ops.debug import validate_pipeline as _f

    return _f(points, scalars, **kwargs)


__all__ = [
    "compute_msm",
    "compute_msm_batch",
    "precompute_msm_base",
    "compute_msm_precomputed",
    "compute_msm_batch_precomputed",
    "compute_msm_sharded",
    "compute_msm_batch_sharded",
    "validate_pipeline",
    "P",
    "EDWARDS_A",
    "EDWARDS_D",
    "SUBGROUP_ORDER",
    "PARAMS",
    "MsmConfig",
]
__version__ = "0.2.0"
