"""Multi-chip sharded MSM on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — covers SURVEY.md §2.5's new
distributed component."""

import jax
import numpy as np
import pytest

from webgpu_msm_twisted_edwards_tpu.parallel import sharded
from webgpu_msm_twisted_edwards_tpu.utils import oracle

from conftest import random_points_scalars


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


@pytest.mark.skipif(not oracle.available(), reason="liboracle.so not built")
def test_sharded_msm_matches_oracle():
    pts, scalars = random_points_scalars(64, seed=71)
    aff = [p.to_affine() for p in pts]
    mesh = sharded.default_mesh(4)
    got = sharded.compute_msm_sharded(aff, scalars, mesh=mesh, chunk_size=4, bpr_chunks=4)
    want = oracle.msm(aff, scalars)
    assert (got["x"], got["y"]) == want


@pytest.mark.skipif(not oracle.available(), reason="liboracle.so not built")
def test_sharded_msm_8_devices():
    pts, scalars = random_points_scalars(64, seed=72)
    aff = [p.to_affine() for p in pts]
    mesh = sharded.default_mesh(8)
    got = sharded.compute_msm_sharded(aff, scalars, mesh=mesh, chunk_size=4, bpr_chunks=4)
    want = oracle.msm(aff, scalars)
    assert (got["x"], got["y"]) == want
