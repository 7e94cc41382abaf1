"""Benchmark harness package.

Role parity with the reference's benchmark layer: the end-to-end driver
(reference: src/submission/miscellaneous/full_benchmarks.ts:43-167), the
per-stage micro-benchmarks (reference: src/submission/miscellaneous/*.ts),
and the UI dashboard / CSV export (reference: src/ui/AllBenchmarks.tsx,
src/ui/CSVExportButton.tsx:8-24) — as a CLI:

    python -m webgpu_msm_twisted_edwards_tpu.benchmarks full --powers 16 20
    python -m webgpu_msm_twisted_edwards_tpu.benchmarks mont
    python -m webgpu_msm_twisted_edwards_tpu.benchmarks dashboard --power 16
    ... (see `--help` for all subcommands)
"""
