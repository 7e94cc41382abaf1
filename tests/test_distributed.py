"""Multi-host MSM: a real 2-process jax.distributed run on CPU.

Each process owns 2 virtual CPU devices (global mesh of 4) and feeds its local
shard of points/scalars to `compute_msm_multihost`
(webgpu_msm_twisted_edwards_tpu/parallel/distributed.py); both processes must
return the identical global result, verified against the native oracle.  This
is CI coverage for the DCN path the reference lists as future work
(reference: README.md:551)."""

import json
import os
import socket
import subprocess
import sys

import pytest

from webgpu_msm_twisted_edwards_tpu.utils import oracle

from conftest import random_points_scalars

_WORKER = r"""
import json, os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=proc_id
)
assert jax.process_count() == 2 and len(jax.devices()) == 4

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from conftest import random_points_scalars
from webgpu_msm_twisted_edwards_tpu.models import cuzk
from webgpu_msm_twisted_edwards_tpu.parallel.distributed import compute_msm_multihost

n_global = 256
pts, scalars = random_points_scalars(n_global, seed=80)
coords, sc = cuzk.prepare_inputs([p.to_affine() for p in pts], scalars)
n_local = n_global // 2
lo = proc_id * n_local
res = compute_msm_multihost(
    coords[lo : lo + n_local], sc[lo : lo + n_local], chunk_size=8
)
print("RESULT " + json.dumps({"x": str(res["x"]), "y": str(res["y"])}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(not oracle.available(), reason="liboracle.so not built")
def test_two_process_distributed_msm(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = (
        here + os.pathsep + repo + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=here,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        # The interpret-mode shard pipeline compiles ~5-8 min per process on
        # CPU; a loaded machine (e.g. another compile-heavy pytest in
        # parallel) has been seen to push one worker past 25 min, so the
        # budget is generous — a hung worker still fails, just late.
        out, _ = p.communicate(timeout=2700)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-3000:]
        d = json.loads(lines[-1][len("RESULT "):])
        results.append((int(d["x"]), int(d["y"])))
    # Both processes computed the same global result.
    assert results[0] == results[1]
    pts, scalars = random_points_scalars(256, seed=80)
    want = oracle.msm([p.to_affine() for p in pts], scalars)
    assert results[0] == want
