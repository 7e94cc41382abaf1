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


def test_aot_poisoned_reload_falls_back(tmp_path, monkeypatch):
    """A cache entry whose reloaded executable fails the known-answer
    self-check must be dropped and recompiled (VERDICT r3 #8: the guard that
    lets the cache default on despite runtimes that replay deserialized
    executables unreliably)."""
    import pickle

    monkeypatch.setenv("MSM_AOT_CACHE", "force")
    monkeypatch.setenv("MSM_AOT_CACHE_DIR", str(tmp_path))

    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils.aot_cache import aot_jit

    @aot_jit(static_argnames=("s",))
    def h(x, s):
        return x * s

    x = jnp.arange(8, dtype=jnp.float32)
    np.asarray(h(x, s=2))
    (blob,) = [p for p in tmp_path.iterdir() if p.suffix == ".aotx"]

    # Poison the stored fingerprint: simulates a runtime that reloads the
    # executable but computes garbage (the corner no longer matches).
    fmt, ndev, payload, in_tree, out_tree, _fp = pickle.loads(blob.read_bytes())
    blob.write_bytes(pickle.dumps(
        (fmt, ndev, payload, in_tree, out_tree, "bogus")))

    # A fresh wrapper (new process analogue) must REJECT the poisoned entry
    # and fall back to tracing its own body — observable because the new body
    # differs.
    @aot_jit(static_argnames=("s",))
    def h(x, s):  # noqa: F811
        return x * s + 7

    out = np.asarray(h(x, s=2))
    assert (out == np.arange(8) * 2 + 7).all()
    # The poisoned file was dropped and replaced by the fresh compile's entry.
    blobs = [p for p in tmp_path.iterdir() if p.suffix == ".aotx"]
    assert len(blobs) == 1


def test_aot_bad_reload_marks_runtime_and_disables(tmp_path, monkeypatch):
    """A failed known-answer self-check persists a bad-runtime sentinel, and
    with the default mode ('1') that sentinel turns the cache OFF for every
    later process on the same runtime (VERDICT r4 #5: default-on needs the
    guard to be durable, not just per-entry)."""
    import pickle

    monkeypatch.setenv("MSM_AOT_CACHE", "force")
    monkeypatch.setenv("MSM_AOT_CACHE_DIR", str(tmp_path))

    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils import aot_cache as AC

    @AC.aot_jit(static_argnames=("s",))
    def r(x, s):
        return x * s

    x = jnp.arange(8, dtype=jnp.float32)
    np.asarray(r(x, s=2))
    (blob,) = [p for p in tmp_path.iterdir() if p.suffix == ".aotx"]
    fmt, ndev, payload, in_tree, out_tree, _fp = pickle.loads(blob.read_bytes())
    blob.write_bytes(pickle.dumps(
        (fmt, ndev, payload, in_tree, out_tree, "bogus")))

    assert not AC.runtime_marked_bad()

    @AC.aot_jit(static_argnames=("s",))
    def r(x, s):  # noqa: F811
        return x * s + 1

    out = np.asarray(r(x, s=2))      # falls back to a fresh compile...
    assert (out == np.arange(8) * 2 + 1).all()
    assert AC.runtime_marked_bad()   # ...and the runtime is now marked bad.

    # Default mode: the sentinel disables the cache on a TPU runtime.
    monkeypatch.setenv("MSM_AOT_CACHE", "1")
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    monkeypatch.setattr(AC, "_runtime_is_axon", lambda: False)
    assert not AC.enabled()
    # force still overrides (probe escape hatch).
    monkeypatch.setenv("MSM_AOT_CACHE", "force")
    assert AC.enabled()
    # Deleting the sentinel re-enables the default mode.
    monkeypatch.setenv("MSM_AOT_CACHE", "1")
    import os

    os.unlink(AC._sentinel_path())
    assert AC.enabled()


def test_aot_default_mode_and_axon_autodetect(monkeypatch, tmp_path):
    """MSM_AOT_CACHE defaults to '1' (cache on for healthy TPU runtimes);
    the axon tunnel auto-detects to off (it replays reloaded executables
    unreliably, docs/MEASUREMENTS.md)."""
    monkeypatch.delenv("MSM_AOT_CACHE", raising=False)
    monkeypatch.setenv("MSM_AOT_CACHE_DIR", str(tmp_path))

    from webgpu_msm_twisted_edwards_tpu.utils import aot_cache as AC

    assert AC._mode() == "1"
    assert not AC.enabled()          # CPU backend in CI
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    monkeypatch.setattr(AC, "_runtime_is_axon", lambda: True)
    assert not AC.enabled()          # axon auto-off
    monkeypatch.setattr(AC, "_runtime_is_axon", lambda: False)
    assert AC.enabled()
    # JAX_PLATFORMS mentioning axon is one of the detection signals.
    monkeypatch.undo()
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    assert AC._runtime_is_axon()


def test_aot_old_format_dropped(tmp_path, monkeypatch):
    """Entries from older on-disk formats are treated as corrupt (dropped,
    recompiled) rather than mis-unpickled."""
    monkeypatch.setenv("MSM_AOT_CACHE", "force")
    monkeypatch.setenv("MSM_AOT_CACHE_DIR", str(tmp_path))
    import pickle

    import jax.numpy as jnp

    from webgpu_msm_twisted_edwards_tpu.utils.aot_cache import aot_jit

    @aot_jit(static_argnames=("s",))
    def q(x, s):
        return x - s

    x = jnp.arange(4, dtype=jnp.float32)
    np.asarray(q(x, s=1))
    (blob,) = [p for p in tmp_path.iterdir() if p.suffix == ".aotx"]
    data = pickle.loads(blob.read_bytes())
    blob.write_bytes(pickle.dumps(data[1:]))  # the pre-fingerprint 4-tuple

    @aot_jit(static_argnames=("s",))
    def q(x, s):  # noqa: F811
        return x - s - 1

    assert np.asarray(q(x, s=1)).tolist() == [-2.0, -1.0, 0.0, 1.0]


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
