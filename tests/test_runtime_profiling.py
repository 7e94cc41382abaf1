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


def test_device_memory_from_kind_string():
    """With no memory stats reported, HBM capacity derives from the device
    kind (the tunneled TPU runtime returns None from memory_stats; an 8 GB
    guess on a 16 GB v5e halves the window group — see runtime.py)."""
    from unittest import mock

    from webgpu_msm_twisted_edwards_tpu.utils import runtime as rt

    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

        def memory_stats(self):
            return None

    gib = 1 << 30
    for kind, want in (
        ("TPU v5 lite", 16 * gib),
        ("TPU v5p", 95 * gib),
        ("TPU v4", 32 * gib),
        ("TPU v6 lite", 32 * gib),
        ("weird accelerator", 8 * gib),     # unknown -> conservative default
    ):
        with mock.patch.object(rt, "get_device", return_value=FakeDev(kind)):
            assert rt.device_memory_bytes() == want, kind
    # Reported stats still win over the kind string.
    class StatsDev(FakeDev):
        def memory_stats(self):
            return {"bytes_limit": 123 * gib}

    with mock.patch.object(rt, "get_device", return_value=StatsDev("TPU v4")):
        assert rt.device_memory_bytes() == 123 * gib


def test_wallclock_and_annotate():
    from webgpu_msm_twisted_edwards_tpu.utils import profiling as pf

    lines = []
    with pf.wallclock("unit", sink=lines.append):
        pass
    assert lines and lines[0].startswith("unit:")
    with pf.annotate("span"):
        pass
