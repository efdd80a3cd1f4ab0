"""Custom stateful streaming operators (X5, SURVEY.md §2.9) via
``applyInPandasWithState`` — Arrow-batched per-key state the built-in
operators can't express.

The flagship op is **streaming exact dedup with bounded state**: the
LLM-pipeline primitive "emit each record once, count suppressed
repeats", maintained across micro-batches. Spark's own
``dropDuplicates`` on streams keeps per-key state too but cannot
report duplicate counts nor cap state size per key; this operator does
both.

100 TB posture:
- state is ONE small row per key (first-seen timestamp + counts), not
  the record payload — state size is O(distinct keys), independent of
  stream volume;
- a processing-time timeout expires idle keys so state does not grow
  without bound on open-ended key domains;
- the per-key group shuffle is the same hash partitioning any
  stateful op pays; within a partition processing is Arrow-batched
  pandas, not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: per-key accumulated state: total seen. (No stored n_dup — the
#: lifetime duplicate count is always n_seen - 1 once seen, and the
#: emitted n_dup is the BATCH delta; storing it doubled the state row
#: for a derivable value — r11 review.)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_new", T.LongType()),
        T.StructField("n_dup", T.LongType()),
        T.StructField("total_seen", T.LongType()),
    ]
)


def dedup_counts_stream(
    stream: DataFrame,
    key_col: str,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key dedup accounting across micro-batches: for every key
    observed in a batch, emit how many of its rows were first-sightings
    (``n_new``: 1 the first time, 0 after) vs suppressed duplicates,
    plus the lifetime total. Keys idle longer than
    ``state_timeout_ms`` are expired (state eviction).

    Returns a streaming DataFrame (update output mode).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_batch = 0
        for pdf in pdfs:
            n_batch += len(pdf)
        n_seen = state.get[0] if state.exists else 0
        n_new = 1 if n_seen == 0 and n_batch > 0 else 0
        dup_delta = n_batch - n_new
        n_seen += n_batch
        state.update((n_seen,))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {
                # preserve SQL NULL keys: str() would render 'None',
                # colliding with a genuine "None" string key
                "key": [None if key[0] is None else str(key[0])],
                "n_new": [n_new],
                "n_dup": [dup_delta],
                "total_seen": [n_seen],
            }
        )

    timeout: Any = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        fn, _OUTPUT_SCHEMA, _STATE_SCHEMA, "update", timeout
    )
