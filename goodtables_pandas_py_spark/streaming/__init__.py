"""Streaming validation (SURVEY.md §2.9 X5)."""

from .stateful import dedup_counts_stream
from .validate import (
    error_rate_windows,
    fk_check_foreach_batch,
    session_event_counts,
    validate_stream,
)

__all__ = [
    "dedup_counts_stream",
    "error_rate_windows",
    "fk_check_foreach_batch",
    "session_event_counts",
    "validate_stream",
]
