"""Pallas/Mosaic TPU kernels — the production compute path.

Layout convention: field elements inside kernels are [NUM_WORDS, B] uint32
arrays (limb axis on sublanes, batch on the 128-wide lane axis).  HBM-side
arrays are row-major with wide minor dims (>= 64 u32) so XLA's (8, 128) tiling
wastes nothing and row gathers run at full rate.

These kernels are the TPU-native re-design of the reference's WGSL shaders
(reference: src/submission/implementation/wgsl/) — same math, completely
different parallel decomposition.
"""

from . import common, convert, ec, scan, bpr  # noqa: F401
