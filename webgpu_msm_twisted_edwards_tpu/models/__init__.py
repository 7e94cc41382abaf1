"""Model layer: the production MSM engine and the baseline implementations
(reference analogues: src/submission/submission.ts and
src/reference/reference.ts)."""

from . import baselines, cuzk  # noqa: F401
from .cuzk import compute_msm  # noqa: F401
