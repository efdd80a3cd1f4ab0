"""Streaming validation (SURVEY.md §2.9 X5)."""

from .dedup import (
    incremental_embedding_dedup_foreach_batch,
    incremental_near_dedup_foreach_batch,
)
from .stateful import dedup_counts_stream
from .validate import (
    asof_enrich_foreach_batch,
    error_rate_windows,
    fk_check_foreach_batch,
    session_event_counts,
    validate_stream,
    windowed_event_rollup,
)

__all__ = [
    "asof_enrich_foreach_batch",
    "dedup_counts_stream",
    "error_rate_windows",
    "fk_check_foreach_batch",
    "incremental_embedding_dedup_foreach_batch",
    "incremental_near_dedup_foreach_batch",
    "session_event_counts",
    "validate_stream",
    "windowed_event_rollup",
]
