"""Device ops layer.

- `pallas/` — the production Mosaic kernels (field, EC, scan, BPR, convert).
- `msm_pipeline` — the production device pipeline (sort → gather → scan →
  carries → extraction → BPR).
- `field`, `curve`, `convert`, `buckets`, `bpr` — the pure-XLA implementations
  (the correctness mirror and small-input path).
- `barrett`, `barrett_domb`, `montgomery_variants`, `scalar_mul` — parity/
  benchmark variants of the field arithmetic and scalar-mul strategies.
- `smtvp` — the scatter bucket-accumulation experiment (measured rejection,
  docs/DESIGN.md §6).
- `debug` — per-stage device-vs-mirror validators.
"""
