"""Temporal join operators (SURVEY.md §2.9 family — operators Spark
lacks natively, re-expressed Spark-first): AS-OF JOIN, the
time-series/event-enrichment primitive ("each event gets the most
recent dimension row at or before its timestamp").

Architecture — NOT a join at all: a naive as-of as a range join plans
as a nested loop (quadratic per key); the classic sort-merge
formulation needs a custom physical operator. Spark-first shape:

    union(left tagged, right tagged)
      → ONE hash shuffle on the ``by`` keys
      → per-key sort by (ts, tag)
      → last(right-payload struct, ignoreNulls) over an
        unbounded-preceding window
      → filter back to left rows.

One shuffle, partition-local sort, whole-stage codegen — the same
cost envelope as a groupBy over the union, at any scale. The payload
travels as ONE struct so every matched column comes from the SAME
right row (per-column ``last`` could stitch different rows when a
payload column is null).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each ``left`` row, attach the columns of the LATEST
    ``right`` row with ``right.ts <= left.ts`` (backward as-of,
    inclusive), matching within ``by`` keys. Unmatched left rows keep
    nulls (left-outer semantics — every left row survives).

    ``right_cols`` defaults to right's non-key, non-ts columns; each
    lands as ``<name><suffix>`` (suffix applied unconditionally, so
    output names are predictable). The matched right timestamp is
    always included as ``<ts_col><suffix>``. ``tolerance`` (a Column
    interval or numeric delta, e.g. ``F.expr("INTERVAL 1 HOUR")``)
    voids matches older than ``left.ts - tolerance``.

    Semantics notes: ties on ``ts`` match (inclusive); among right
    rows sharing the same key AND timestamp the winner is
    plan-order-dependent — disambiguate upstream if right has
    same-instant duplicates.
    """
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*by, ts_col}]
    missing = [c for c in [*by, ts_col] if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks columns {missing}")

    payload = F.struct(
        F.col(ts_col).alias(f"__rts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l__{c}")
          for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l__{c}") for c in left.columns],
    )
    # right rows order BEFORE left rows at equal ts (tag 0 < 1), so an
    # exact-timestamp dimension row is visible to the event — the
    # inclusive convention
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .where(F.col("__tag") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__match").isNotNull()
                & (F.col("__match")["__rts"] >= F.col(ts_col) - tolerance),
                F.col("__match"),
            ),
        )
    out_cols = [
        F.col(f"__l__{c}").alias(c) for c in left.columns
    ] + [F.col("__match")["__rts"].alias(f"{ts_col}{suffix}")] + [
        F.col("__match")[c].alias(f"{c}{suffix}") for c in right_cols
    ]
    return matched.select(*out_cols)
