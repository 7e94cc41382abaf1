"""Multi-device execution: single-host multi-chip (`sharded`) and multi-host
(`distributed`) — the new first-class capability beyond the single-device
reference (SURVEY.md §2.5)."""

from . import distributed, sharded  # noqa: F401
from .sharded import compute_msm_batch_sharded, compute_msm_sharded  # noqa: F401
