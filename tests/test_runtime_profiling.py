"""Coverage for the device-runtime and profiling helpers (the gpu.ts /
tracing analogues; reference: src/submission/implementation/cuzk/gpu.ts,
ui/Benchmark.tsx:29-39)."""

import numpy as np


def test_runtime_helpers():
    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils import runtime as rt

    dev = rt.get_device()
    info = rt.device_info()
    assert info["backend"] and info["num_devices"] >= 1

    host = np.arange(16, dtype=np.uint32)
    darr = rt.to_device(host)
    assert rt.read_back(darr).tolist() == host.tolist()

    compiled = rt.compile(lambda a: a + jnp.uint32(1), jnp.asarray(host))
    out = compiled(jnp.asarray(host))
    assert rt.read_back(out)[0] == 1
    rt.delete_buffers(darr)


def test_wallclock_and_annotate():
    from webgpu_msm_twisted_edwards_tpu.utils import profiling as pf

    lines = []
    with pf.wallclock("unit", sink=lines.append):
        pass
    assert lines and lines[0].startswith("unit:")
    with pf.annotate("span"):
        pass
