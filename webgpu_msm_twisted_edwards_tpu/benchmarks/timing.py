"""Timing utilities shared by the benchmark suite.

Wall-clock protocol parity with the reference (reference:
src/ui/Benchmark.tsx:29-39 performance.now() around one run;
full_benchmarks.ts:62-107 Date.now() with forced-recompile first run):
device timing forces completion by fetching one element of a dependent
output, never the full array — host<->device transfer is benchmarked
separately (micro.py data_transfer), exactly like the reference isolates it
(reference: miscellaneous/data_transfer_cost_benchmarks.ts:16).
"""

from __future__ import annotations

import csv
import io
import time
from dataclasses import dataclass, field


def force(out):
    """Block until `out` is computed by fetching a single element."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return jax.device_get(leaf[tuple([slice(0, 1)] * leaf.ndim)])


def time_device(fn, *args, runs: int = 5):
    """Returns (compile_ms, [run_ms...]).  First call includes XLA compile —
    the analogue of the reference's forced-recompile first run."""
    t0 = time.time()
    force(fn(*args))
    compile_ms = (time.time() - t0) * 1e3
    ts = []
    for _ in range(runs):
        t0 = time.time()
        force(fn(*args))
        ts.append((time.time() - t0) * 1e3)
        time.sleep(0.1)  # reference protocol: 100 ms gaps
    return compile_ms, ts


@dataclass
class Table:
    """Markdown + CSV result table (reference: full_benchmarks.ts:129-155
    Markdown assembly; CSVExportButton.tsx CSV export)."""

    headers: list[str]
    rows: list[list] = field(default_factory=list)

    def add(self, *row):
        self.rows.append(list(row))

    def markdown(self) -> str:
        out = ["| " + " | ".join(self.headers) + " |",
               "|" + "|".join("---" for _ in self.headers) + "|"]
        for r in self.rows:
            out.append("| " + " | ".join(str(c) for c in r) + " |")
        return "\n".join(out)

    def csv(self) -> str:
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(self.headers)
        w.writerows(self.rows)
        return buf.getvalue()

    def save_csv(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.csv())


def median(xs):
    return sorted(xs)[len(xs) // 2]
