"""Persistent AOT-compiled-executable cache — the driver-side shader cache.

The reference's browser driver caches compiled shader modules keyed by source
(reference: src/submission/implementation/shader_manager.ts:85-92), so a
returning user pays shader compilation once.  On this rig the analogous XLA
persistent compilation cache does not work (remote-compile helper; see
BASELINE.md), and a cold process pays 20-340 s (congested spikes: 1,400+ s)
per pipeline shape class.  `jax.experimental.serialize_executable` round-trips
a compiled executable through bytes, and a deserialize+load measures ~10 s for
the 2^20 window-group program vs its compile (experiments/aot_cache_probe.py)
— so this module implements the cache the runtime doesn't give us:

    aot_jit(fn, static_argnames=...)  — drop-in for jax.jit at the staged-
    pipeline call sites.  On TPU (or with MSM_AOT_CACHE=force), each (static
    args, dynamic arg shapes) class is compiled once, serialized into
    ~/.cache/webgpu_msm_tpu_aot/, and re-loaded by later processes.

Safety: cache keys include a fingerprint of every .py source in this package
plus the jax version and device kind, so ANY code change invalidates the
whole cache (stale executables would silently compute old results).  Disk or
deserialization failures fall back to a normal jit compile.

Env knobs: MSM_AOT_CACHE=1 (the default) enables on TPU; =0 disables;
=force enables on any backend (used by CI to exercise the real path on
CPU); MSM_AOT_CACHE_DIR overrides the location.

The cache defaults ON (VERDICT r4 #5 — the reference's driver shader cache
is always-on; shader_manager.ts:85-92 exists only to *bust* it), guarded two
ways, because this rig's tunneled "axon" runtime executes deserialized
executables unreliably (measured round-trips load in ~10 s and run correctly
in some processes, while others see FAILED_PRECONDITION at dispatch or
multi-minute stalls on the same entries — docs/MEASUREMENTS.md "AOT
executable serialization"):

  1. axon auto-detect: `enabled()` turns the cache off when the backend is
     the tunneled axon plugin (its PJRT platform_version carries the plugin
     name), unless MSM_AOT_CACHE=force.
  2. known-answer self-check + persisted sentinel: every reload re-runs the
     executable on all-zero inputs against a fingerprint recorded at store
     time; a dispatch exception or wrong answer marks the RUNTIME bad with
     an on-disk sentinel (`bad_runtime-<runtime key>`), so every later
     process on that runtime skips straight to compiling.  Delete the
     sentinel (or set MSM_AOT_CACHE=force) to retry.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from functools import partial

_FINGERPRINT = None


def _code_fingerprint() -> str:
    """Hash of all package sources + jax version (computed once)."""
    global _FINGERPRINT
    if _FINGERPRINT is None:
        import jax

        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        h.update(jax.__version__.encode())
        for root, _dirs, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _FINGERPRINT = h.hexdigest()[:16]
    return _FINGERPRINT


def cache_dir() -> str:
    d = os.environ.get("MSM_AOT_CACHE_DIR")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache", "webgpu_msm_tpu_aot")
    return d


def _mode() -> str:
    return os.environ.get("MSM_AOT_CACHE", "1")


def _runtime_key() -> str:
    """Identity of the runtime a bad-reload sentinel applies to: device kind
    + PJRT platform version (a tunnel/plugin swap is a different runtime)."""
    import jax

    d = jax.devices()[0]
    pv = getattr(d.client, "platform_version", "")
    return hashlib.sha256(f"{d.device_kind}|{pv}".encode()).hexdigest()[:16]


def _sentinel_path() -> str:
    return os.path.join(cache_dir(), f"bad_runtime-{_runtime_key()}")


def runtime_marked_bad() -> bool:
    return os.path.exists(_sentinel_path())


def mark_runtime_bad(reason: str) -> None:
    """Persist that this runtime replayed a deserialized executable badly
    (dispatch error or known-answer mismatch); later processes skip the
    cache entirely instead of re-risking a wrong result or a stall."""
    try:
        os.makedirs(cache_dir(), exist_ok=True)
        with open(_sentinel_path(), "w") as fh:
            fh.write(reason + "\n")
    except OSError:
        pass


def _runtime_is_axon() -> bool:
    """True on the tunneled 'axon' TPU runtime (executes reloaded
    executables unreliably; docs/MEASUREMENTS.md)."""
    import jax

    try:
        from jax._src import xla_bridge

        d = jax.devices()[0]
        hay = " ".join([
            str(getattr(d.client, "platform", "")),
            str(getattr(d.client, "platform_version", "")),
            str(os.environ.get("JAX_PLATFORMS", "")),
            " ".join(xla_bridge.backends()),
        ]).lower()
        return "axon" in hay
    except Exception:
        return False


def enabled() -> bool:
    """Default ON for TPU runtimes ('1'); '0' disables; 'force' enables on
    any backend and overrides both the axon auto-detect and a bad-runtime
    sentinel (for probes)."""
    mode = _mode()
    if mode == "force":
        return True
    if mode != "1":
        return False
    import jax

    if jax.default_backend() != "tpu":
        return False
    return not _runtime_is_axon() and not runtime_marked_bad()


#: On-disk pickle format version; reloads of other versions are dropped.
_FORMAT = 2


def _zeros_like_args(args):
    """Deterministic known-answer inputs matching the dynamic args' avals."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: jnp.zeros(getattr(a, "shape", ()), getattr(a, "dtype", None)),
        args,
    )


def _fingerprint_outputs(out) -> str:
    """Cheap output fingerprint: shapes, dtypes, and a <=4-element corner of
    every leaf (a full fetch would crawl through the tunnel; the corner is
    enough to catch the observed bad-reload modes — dispatch errors surface
    as exceptions before this, garbage output changes the corner)."""
    import jax

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(out):
        import numpy as np

        corner = leaf[tuple(slice(0, min(2, d)) for d in leaf.shape)]
        a = np.asarray(jax.device_get(corner))
        h.update(str(leaf.shape).encode())
        h.update(str(leaf.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


class _AotJit:
    """jax.jit wrapper with a persistent compiled-executable cache.

    Call convention: dynamic arguments positionally, static arguments as
    KEYWORDS (enforced) — the serialized executable is invoked with exactly
    the positional dynamic args.

    Every stored entry carries a known-answer fingerprint (the executable run
    on all-zero inputs at store time); `_load` re-runs the reloaded
    executable on the same zeros and falls back to a fresh compile on any
    exception or fingerprint mismatch — the guard VERDICT r3 #8 asked for
    before the cache could default on (this rig's tunneled runtime has
    executed reloaded executables incorrectly; docs/MEASUREMENTS.md)."""

    def __init__(self, fn, static_argnames=()):
        import jax

        self._fn = fn
        self._name = getattr(fn, "__name__", "fn")
        self._static = tuple(static_argnames)
        self._jit = jax.jit(fn, static_argnames=static_argnames)
        self._mem: dict[str, object] = {}

    def _key(self, args, statics) -> str:
        import jax

        parts = [self._name, _code_fingerprint(),
                 jax.devices()[0].device_kind, repr(sorted(statics.items()))]
        for leaf in jax.tree_util.tree_leaves(args):
            parts.append(f"{getattr(leaf, 'dtype', type(leaf))}{getattr(leaf, 'shape', '')}")
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]

    def _path(self, key: str) -> str:
        return os.path.join(cache_dir(), f"{self._name}-{key}.aotx")

    def __call__(self, *args, **kwargs):
        bad = [k for k in kwargs if k not in self._static]
        assert not bad, f"non-static kwargs {bad}; pass dynamic args positionally"
        if not enabled():
            return self._jit(*args, **kwargs)
        key = self._key(args, kwargs)
        compiled = self._mem.get(key)
        if compiled is None:
            compiled = self._load(key, args)
        if compiled is None:
            compiled = self._jit.lower(*args, **kwargs).compile()
            self._store(key, compiled, args)
        self._mem[key] = compiled
        return compiled(*args)

    def _load(self, key: str, args):
        import jax
        from jax.experimental.serialize_executable import deserialize_and_load

        path = self._path(key)
        try:
            with open(path, "rb") as fh:
                fmt, ndev, payload, in_tree, out_tree, want_fp = pickle.load(fh)
            if fmt != _FORMAT:
                raise ValueError(f"cache format {fmt} != {_FORMAT}")
            # deserialize defaults to ALL local devices; restore onto the
            # same number the executable was compiled for (1 for jit
            # programs) or an 8-virtual-device CPU mesh rejects the args.
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:ndev],
            )
            # Known-answer self-check: the reloaded executable must reproduce
            # the fingerprint recorded at store time on all-zero inputs.  A
            # dispatch error or a wrong corner means the RUNTIME replayed the
            # blob badly (the bytes themselves round-trip losslessly) — mark
            # the runtime bad so later processes skip the cache, then
            # recompile (VERDICT r4 #5).
            try:
                got_fp = _fingerprint_outputs(compiled(*_zeros_like_args(args)))
                bad = "known-answer fingerprint mismatch" if got_fp != want_fp else None
            except Exception as e:  # dispatch failure on the reloaded blob
                bad = f"reloaded executable failed to dispatch: {e!r}"
            if bad is not None:
                mark_runtime_bad(f"{self._name}-{key}: {bad}")
                raise ValueError(bad)
            return compiled
        except FileNotFoundError:
            return None
        except Exception:
            # Corrupt blob, runtime-version mismatch, or failed self-check:
            # drop it and recompile.
            try:
                os.unlink(path)
            except OSError:
                pass
            return None

    def _store(self, key: str, compiled, args) -> None:
        from jax.experimental.serialize_executable import serialize

        try:
            fp = _fingerprint_outputs(compiled(*_zeros_like_args(args)))
            ndev = len(compiled._executable.xla_executable.local_devices())
            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(cache_dir(), exist_ok=True)
            tmp = self._path(key) + ".tmp"
            with open(tmp, "wb") as fh:
                pickle.dump((_FORMAT, ndev, payload, in_tree, out_tree, fp), fh)
            os.replace(tmp, self._path(key))
        except Exception:
            pass  # cache is best-effort; the compiled executable still runs

    def clear_cache(self) -> None:
        """force_recompile semantics (reference: shader_manager.ts:85-92
        cache buster): drop in-memory executables, this function's disk
        entries, and the underlying jit trace cache."""
        self._mem.clear()
        self._jit.clear_cache()
        try:
            for f in os.listdir(cache_dir()):
                if f.startswith(self._name + "-"):
                    os.unlink(os.path.join(cache_dir(), f))
        except OSError:
            pass


def aot_jit(fn=None, *, static_argnames=()):
    if fn is None:
        return partial(aot_jit, static_argnames=static_argnames)
    return _AotJit(fn, static_argnames=static_argnames)
