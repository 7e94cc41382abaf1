"""Test configuration: force an 8-device virtual CPU mesh so sharding logic is
testable without TPU hardware (the analogue of the reference running its CPU
mirrors under jest with no GPU; reference: jest.config.ts, SURVEY.md §4)."""

import os

# The ambient environment pins JAX_PLATFORMS to the TPU tunnel ("axon") and a
# sitecustomize hook registers that backend at interpreter start, so the env
# var alone is not enough — update the jax config directly before any backend
# is initialized.  Tests run on an 8-device virtual CPU mesh by default;
# set RUN_ON_TPU=1 to keep the real TPU backend (enables test_pallas_tpu.py).
import jax

if not os.environ.get("RUN_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

import random
from functools import lru_cache

from webgpu_msm_twisted_edwards_tpu.cpu.curve import GENERATOR
from webgpu_msm_twisted_edwards_tpu.utils.params import SUBGROUP_ORDER


@lru_cache(maxsize=None)
def random_points_scalars(n: int, seed: int = 1):
    """Deterministic test inputs: distinct curve points with random scalars —
    the analogue of the UI's random-input path (reference:
    src/ui/AllBenchmarks.tsx:103-139).  Points are a cheap additive walk from
    a random start so generation stays fast in pure python."""
    r = random.Random(seed)
    scalars = [r.randrange(0, SUBGROUP_ORDER) for _ in range(n)]
    pt = GENERATOR.mul(r.randrange(1, SUBGROUP_ORDER))
    step = GENERATOR.mul(r.randrange(1, SUBGROUP_ORDER))
    points = []
    for _ in range(n):
        points.append(pt)
        pt = pt.add(step)
    # Normalize to affine (z=1) extended points, as API inputs are affine.
    from webgpu_msm_twisted_edwards_tpu.cpu.curve import ExtPoint

    points = [ExtPoint.from_affine(*p.to_affine()) for p in points]
    return points, scalars
