"""Cache-lifetime bookkeeping for lazy operator builders (ADVICE r9).

Several builders (``near_contamination_scan``, the registry pair
checks, the LM scorers) persist an intermediate frame that the
RETURNED lazy plan consumes more than once — without the persist the
most expensive scan would re-run per consumer. The persist must
outlive the builder (the plan is not materialized yet), so the
builder cannot unpersist; but a long-lived session that calls such a
builder repeatedly would otherwise accumulate executor storage until
the driver GCs the plans.

The contract here makes the lifetime explicit without changing any
plan: a builder ATTACHES its persisted intermediates to the frame it
returns (:func:`attach_persisted`), and the caller releases them
after materializing the result (:func:`unpersist_scan_state`) —
typically in a ``finally`` block around the collect/write. Unpersist
is always SAFE for correctness (Spark recomputes from lineage), so a
caller that forgets merely falls back to the old
LRU-eviction-at-session-scope behavior.

The attachment rides on the exact Python object the builder returns;
DataFrame transformations create new objects, so callers that keep
deriving from the result should release via the original handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_gt_persisted"


def attach_persisted(out: DataFrame, *frames: DataFrame) -> DataFrame:
    """Record ``frames`` (persisted intermediates feeding ``out``'s
    plan) on ``out`` for a later :func:`unpersist_scan_state`."""
    # read/write via __dict__, NOT getattr/setattr: DataFrame's
    # __getattr__ resolves unknown attributes as COLUMNS, so a frame
    # with a column literally named "_gt_persisted" would hand back a
    # Column here (not iterable → TypeError) instead of the stash
    held = list(out.__dict__.get(_ATTR, []))
    held.extend(f for f in frames if f is not None)
    out.__dict__[_ATTR] = held
    return out


def get_persisted(df: DataFrame) -> list:
    """The persisted intermediates attached to ``df`` (empty list if
    none). ALWAYS use this instead of ``getattr(df, _ATTR, [])``:
    DataFrame's ``__getattr__`` resolves unknown attributes as
    COLUMNS, so on a frame whose schema happens to carry a
    ``_gt_persisted`` column the getattr form hands back a Column
    (not a list) — the r11 cacheutil lesson, centralized so no call
    site can re-introduce it."""
    return list(df.__dict__.get(_ATTR, []))


def unpersist_scan_state(df: DataFrame, blocking: bool = False) -> int:
    """Release every intermediate a builder attached to ``df``;
    returns how many were released (0 for frames with no attachment —
    safe to call unconditionally)."""
    held = df.__dict__.get(_ATTR, [])
    for f in held:
        f.unpersist(blocking)
    if held:
        df.__dict__[_ATTR] = []
    return len(held)
