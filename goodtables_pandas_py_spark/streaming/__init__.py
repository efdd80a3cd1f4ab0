"""Streaming validation (SURVEY.md §2.9 X5)."""

from .validate import (
    error_rate_windows,
    fk_check_foreach_batch,
    session_event_counts,
    validate_stream,
)

__all__ = [
    "error_rate_windows",
    "fk_check_foreach_batch",
    "session_event_counts",
    "validate_stream",
]
