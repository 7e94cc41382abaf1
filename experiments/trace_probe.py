"""Capture + parse an XProf device trace of one staged-pipeline MSM at 2^20.

Attributes the gap between the per-stage micro-bench sum (~452 ms) and the
measured end-to-end steady state (490 ms) to specific HLO ops: XLA glue like
the digits dynamic-slice copy, keys/sames construction, reshapes/transposes,
and scheduling gaps between the staged dispatches.

Run on TPU:  python experiments/trace_probe.py [log2n]
Parses the freshest .xplane.pb under /tmp/msm_trace_staged and prints the
top device ops by self time.
"""

from __future__ import annotations

import glob
import os
import sys
import time


def capture(power: int, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from webgpu_msm_twisted_edwards_tpu.ops import msm_pipeline as MP
    from webgpu_msm_twisted_edwards_tpu.utils import oracle
    from webgpu_msm_twisted_edwards_tpu.utils.params import tpu_msm_config

    n = 1 << power
    pts_u64 = oracle.gen_points(n, seed=20230923)
    rng = np.random.default_rng(42)
    sc_u64 = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.uint64)
    sc_u64[:, 3] &= (1 << 58) - 1
    coords = jax.device_put(jnp.asarray(pts_u64.view(np.uint32).reshape(n, 2, 8)))
    scalars = jax.device_put(jnp.asarray(sc_u64.view(np.uint32).reshape(n, 8)))
    cfg = tpu_msm_config(n)

    def run():
        rows = np.asarray(
            MP.msm_window_sums_staged(coords, scalars, cfg, fold=True)
        )
        return rows

    t0 = time.time()
    run()
    print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)
    for i in range(2):
        t0 = time.time()
        run()
        print(f"steady run {i}: {(time.time()-t0)*1e3:.1f} ms", flush=True)
    with jax.profiler.trace(log_dir):
        run()


def parse(log_dir: str) -> None:
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane under {log_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xspace.ParseFromString(fh.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"\n== plane: {plane.name} ==")
        # Sum event durations per event-metadata name across all lines.
        totals: dict[str, float] = {}
        counts: dict[str, int] = {}
        span_begin, span_end = None, None
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                totals[name] = totals.get(name, 0.0) + dur
                counts[name] = counts.get(name, 0) + 1
                b = ev.offset_ps
                e = ev.offset_ps + ev.duration_ps
                span_begin = b if span_begin is None else min(span_begin, b)
                span_end = e if span_end is None else max(span_end, e)
        if span_begin is not None:
            print(f"trace span: {(span_end - span_begin) / 1e9:.1f} ms")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{ms:9.2f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    power = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    log_dir = "/tmp/msm_trace_staged"
    capture(power, log_dir)
    parse(log_dir)
