"""Persistent AOT executable cache (utils/aot_cache.py) — the analogue of
the reference driver's shader cache (reference: shader_manager.ts:85-92).
MSM_AOT_CACHE=force exercises the real serialize/deserialize path on the CPU
backend."""

import numpy as np


def test_aot_roundtrip_and_clear(tmp_path, monkeypatch):
    monkeypatch.setenv("MSM_AOT_CACHE", "force")
    monkeypatch.setenv("MSM_AOT_CACHE_DIR", str(tmp_path))

    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils.aot_cache import aot_jit

    @aot_jit(static_argnames=("s",))
    def f(x, s):
        return x * s + 1

    x = jnp.arange(8, dtype=jnp.float32)
    out = np.asarray(f(x, s=3))
    assert (out == np.arange(8) * 3 + 1).all()
    blobs = [p for p in tmp_path.iterdir() if p.suffix == ".aotx"]
    assert len(blobs) == 1, blobs

    # A fresh wrapper around a DIFFERENT body with the same name must load
    # the serialized executable instead of tracing (simulates a new process;
    # the sabotage body would throw if traced).
    @aot_jit(static_argnames=("s",))
    def f(x, s):  # noqa: F811
        raise AssertionError("should have loaded from disk, not retraced")

    out2 = np.asarray(f(x, s=3))
    assert (out2 == out).all()

    # Different static value or shape -> new cache entry.
    @aot_jit(static_argnames=("s",))
    def f(x, s):  # noqa: F811
        return x * s + 1

    np.asarray(f(x, s=4))
    assert len([p for p in tmp_path.iterdir() if p.suffix == ".aotx"]) == 2

    # clear_cache drops this function's disk entries (force_recompile).
    f.clear_cache()
    assert not [p for p in tmp_path.iterdir() if p.suffix == ".aotx"]


def test_aot_disabled_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("MSM_AOT_CACHE", "0")
    monkeypatch.setenv("MSM_AOT_CACHE_DIR", str(tmp_path))

    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils.aot_cache import aot_jit

    @aot_jit(static_argnames=("s",))
    def g(x, s):
        return x + s

    assert np.asarray(g(jnp.ones(4), s=2)).tolist() == [3.0] * 4
    assert not list(tmp_path.iterdir())
