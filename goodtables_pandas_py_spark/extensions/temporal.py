"""Temporal join operators (SURVEY.md §2.9 family — operators Spark
lacks natively, re-expressed Spark-first): AS-OF JOIN, the
time-series/event-enrichment primitive ("each event gets the most
recent dimension row at or before its timestamp"), and RANGE JOIN
(point-in-interval), the lookup-table primitive ("which validity
interval / session window / IP block does this row fall in").

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

import math

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
    same-instant duplicates. NULL ``by`` keys never match (plain SQL
    join-key semantics, like ``range_join`` and DuckDB's native
    ASOF): NULL-keyed left rows come through unmatched.

    SCALE CAVEAT: with ``by=[]`` the window has no partition keys —
    Spark moves everything to ONE task for the sort. Fine for small
    frames; at scale always supply ``by`` (the one-shuffle cost
    claim assumes keyed partitioning).
    """
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*by, ts_col}]
    # the matched timestamp is always exported as <ts_col><suffix>;
    # keeping ts_col in right_cols would emit a duplicate column
    right_cols = [c for c in right_cols if c != ts_col]
    missing = [c for c in [*by, ts_col] if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks columns {missing}")
    missing_l = [c for c in [*by, ts_col] if c not in left.columns]
    if missing_l:
        raise ValueError(f"left side lacks columns {missing_l}")

    payload = F.struct(
        F.col(ts_col).alias(f"__rts"),
        *[F.col(c) for c in right_cols],
    )
    # a NULL-ts right row can never be "at or before" any left ts,
    # but NULLS FIRST ordering would place it at the window start and
    # its non-null payload struct would match every left row preceding
    # the first real right row — drop them before the union
    right = right.where(F.col(ts_col).isNotNull())
    # NULL by-keys never match (SQL join-key semantics, same as
    # range_join and DuckDB's native ASOF): the window's partitionBy
    # GROUPS nulls, so without this a NULL-keyed event silently
    # inherited the latest NULL-keyed dimension row (r11 review).
    # Left rows keep flowing (they just match nothing) — only the
    # right side filters.
    for c in by:
        right = right.where(F.col(c).isNotNull())
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


def _range_domain(dtype) -> tuple:
    """(to_num, unit_scale, integral) for a point/bound column type.
    ``to_num`` maps the column into an orderable numeric domain used
    ONLY for bin assignment — the range predicate itself always
    compares the original columns, so the mapping just has to be
    monotone (it is: unix_micros / datediff / identity)."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return (lambda c: F.unix_micros(c.cast("timestamp")), 1_000_000, True)
    if isinstance(dtype, DateType):
        return (lambda c: F.datediff(c, F.lit("1970-01-01")), 1, True)
    return (lambda c: c, 1, False)


def _auto_bin_width(
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    to_num,
    max_bins: int,
) -> float:
    """Adaptive bin width from a one-pass interval-span sketch (r6,
    advisor item: the old mean-only estimate): returns the numeric-
    domain width ``max(p50, mean/4, max_span/(max_bins-2))``.

    Why each term:
    - **p50** (GK sketch via percentile_approx) is the typical span —
      the width that keeps the TYPICAL interval at 1-2 bins, which is
      what bounds per-bin join candidates. The mean is distorted by
      degenerate spans: a mass of zero/tiny-length sessions drags it
      down and every wide interval then explodes into 2x the bins it
      needs (measured −33% exploded rows on such a mix, BASELINE.md).
    - **mean/4** bounds explode volume when the span mass sits in the
      tail (many tiny + few huge): Σ span/w ≤ 4·N rows, so the
      exploded side never exceeds ~5 rows per interval.
    - **max_span/(max_bins-2)** guarantees no single interval can
      trip the ``max_bins_per_interval`` runtime guard — with an auto
      width the raise_error branch is unreachable; only an explicit
      user ``bin_width`` can hit it. (−2: an interval spanning k
      widths covers at most floor(k)+2 bin indices.)

    One tiny agg job (all three stats partial-aggregate in a single
    pass over the valid intervals); returns 1.0 when there are no
    valid intervals or every span is zero."""
    if max_bins < 3:
        raise ValueError(f"max_bins_per_interval must be >= 3, got {max_bins}")
    span = to_num(F.col(hi_col)) - to_num(F.col(lo_col))
    row = (
        intervals.where(
            F.col(lo_col).isNotNull()
            & F.col(hi_col).isNotNull()
            & (F.col(lo_col) <= F.col(hi_col))
        )
        .agg(
            F.percentile_approx(span, 0.5).alias("p50"),
            F.avg(span).alias("mean"),
            F.max(span).alias("mx"),
        )
        .first()
    )
    if row is None or row["mx"] is None:
        return 1.0
    p50 = float(row["p50"] or 0.0)
    mean = float(row["mean"] or 0.0)
    mx = float(row["mx"] or 0.0)
    w = max(p50, mean / 4.0, mx / (max_bins - 2))
    return w if w > 0 else 1.0


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    bin_width: float | None = None,
    how: str = "inner",
    bounds: str = "closed",
    suffix: str = "_right",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    ``[lo, hi]`` contains its ``point_col`` (matching within ``by``
    keys) — the point-in-interval join Spark plans as a
    BroadcastNestedLoopJoin (quadratic) when written directly.

    Spark-first shape — BINNED EQUI-JOIN: pick a bin width ``w``,
    explode each interval into the bins it covers
    (``sequence(floor(lo/w), floor(hi/w))``), compute each point's
    single bin, hash-join on ``(by…, bin)``, then apply the exact
    range predicate as the join's residual condition. Each
    (point, interval) pair can meet in at most ONE bin (the point's),
    so no dedup pass is needed. Shuffle volume is
    ``points + Σ interval_span/w`` rows — linear, and the join is a
    plain shuffled hash/sort-merge join that AQE can skew-split.
    This is the same strategy Databricks' range-join optimization
    and DataFusion's interval libraries use.

    ``bin_width`` is in the point column's units (seconds for
    timestamps, days for dates); ``None`` picks it adaptively from a
    one-pass span sketch (:func:`_auto_bin_width`, r6: median span
    with an explode-volume floor and a max-span clamp, so the
    max-bins guard below is unreachable on auto width). Pick an
    explicit value near the TYPICAL span: too small explodes wide
    intervals into many bins (guarded by ``max_bins_per_interval`` —
    exceeding it raises at runtime rather than silently dropping
    matches), too large degrades toward everything-in-one-bucket. ``bounds``: "closed" ``[lo,hi]``,
    "left_closed" ``[lo,hi)``, "right_closed" ``(lo,hi]``, "open".
    ``how``: "inner" or "left" (unmatched points survive with null
    interval columns). Intervals with null or inverted bounds match
    nothing and are dropped; null ``by`` keys never match (plain SQL
    join-key semantics).
    """
    by = by or []
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    cmp_lo = {"closed": ">=", "left_closed": ">=",
              "right_closed": ">", "open": ">"}.get(bounds)
    if cmp_lo is None:
        raise ValueError(f"unknown bounds {bounds!r}")
    cmp_hi = "<=" if bounds in ("closed", "right_closed") else "<"
    missing = [c for c in [*by, lo_col, hi_col] if c not in intervals.columns]
    if missing:
        raise ValueError(f"intervals side lacks columns {missing}")
    missing_p = [c for c in [*by, point_col] if c not in points.columns]
    if missing_p:
        raise ValueError(f"points side lacks columns {missing_p}")
    if right_cols is None:
        right_cols = [
            c for c in intervals.columns if c not in {*by, lo_col, hi_col}
        ]
    # the bounds are always exported as <lo_col>/<hi_col><suffix>;
    # keeping them in a user-supplied right_cols would emit duplicate
    # output names (AMBIGUOUS_REFERENCE downstream — r11 review, the
    # asof_join ts_col rule applied to both bounds)
    right_cols = [c for c in right_cols if c not in (lo_col, hi_col)]

    to_num, unit_scale, integral = _range_domain(
        points.schema[point_col].dataType
    )
    if bin_width is not None and bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    if bin_width is None:
        # adaptive width from a one-pass span sketch (r6) — estimated
        # over VALID intervals only; inverted/null rows are dropped
        # below and must not poison the estimate
        w_num = _auto_bin_width(
            intervals, lo_col, hi_col, to_num, max_bins_per_interval
        )
        # ceil, not round: banker's rounding could drop the width
        # below the mx/(max_bins-2) clamp (2.5 -> 2) and trip the
        # max_bins_per_interval guard on a valid auto-width run
        w = max(1, math.ceil(w_num)) if integral else max(w_num, 1e-12)
    else:
        w_num = float(bin_width) * unit_scale
        w = max(1, int(round(w_num))) if integral else max(w_num, 1e-12)

    iv = intervals.where(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    ).select(
        *[F.col(k).alias(f"__k_{k}") for k in by],
        F.col(lo_col).alias("__lo"),
        F.col(hi_col).alias("__hi"),
        *[F.col(c).alias(f"__p_{c}") for c in right_cols],
        F.floor(to_num(F.col(lo_col)) / F.lit(w)).alias("__blo"),
        F.floor(to_num(F.col(hi_col)) / F.lit(w)).alias("__bhi"),
    )
    # raise_error (NullType, coerces into the array branch) rather
    # than a droppable assert column: column pruning cannot elide it
    iv = iv.withColumn(
        "__bin",
        F.explode(
            F.when(
                F.col("__bhi") - F.col("__blo") < F.lit(max_bins_per_interval),
                F.sequence("__blo", "__bhi"),
            ).otherwise(
                F.raise_error(F.concat(
                    F.lit(
                        "range_join: interval spans more than "
                        f"{max_bins_per_interval} bins of width "
                        f"{w / unit_scale!r} — pass a larger bin_width "
                        "or raise max_bins_per_interval (interval ["
                    ),
                    F.col("__lo").cast("string"), F.lit(", "),
                    F.col("__hi").cast("string"), F.lit("])"),
                ))
            ),
        ),
    ).drop("__blo", "__bhi")

    pt = points.withColumn(
        "__pbin", F.floor(to_num(F.col(point_col)) / F.lit(w))
    )
    cond = pt["__pbin"] == iv["__bin"]
    for k in by:
        cond = cond & (pt[k] == iv[f"__k_{k}"])
    p = pt[point_col]
    lo_ok = p > iv["__lo"] if cmp_lo == ">" else p >= iv["__lo"]
    hi_ok = p < iv["__hi"] if cmp_hi == "<" else p <= iv["__hi"]
    joined = pt.join(iv, cond & lo_ok & hi_ok, how)
    return joined.select(
        *[pt[c] for c in points.columns],
        iv["__lo"].alias(f"{lo_col}{suffix}"),
        iv["__hi"].alias(f"{hi_col}{suffix}"),
        *[iv[f"__p_{c}"].alias(f"{c}{suffix}") for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str] = ("lo", "hi"),
    right_bounds: tuple[str, str] = ("lo", "hi"),
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    bin_width: float | None = None,
    how: str = "inner",
    left_id: str | None = None,
    bounds: str = "closed",
    suffix: str = "_right",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Interval-OVERLAP join: each ``left`` interval row joins every
    ``right`` interval row it overlaps (within ``by`` keys) —
    sessions × outages, spans × spans. Directly written this is a
    nested loop; here it is the same binned equi-join as
    ``range_join`` plus the classic FIRST-COMMON-BIN dedup: both
    sides explode into their covered bins, pairs hash-join on
    ``(by…, bin)``, and a pair is emitted only in bin
    ``greatest(floor(l_lo/w), floor(r_lo/w))`` — the first bin the
    two intervals share — so each overlapping pair appears exactly
    once with no distinct pass.

    ``bounds="closed"`` counts touching endpoints
    (``l_lo <= r_hi AND r_lo <= l_hi``); ``"open"`` requires strict
    interior overlap. ``how``: "inner", or "left" which REQUIRES
    ``left_id`` — a column unique per left row — because left-outer
    over exploded bins would emit one null row per non-matching bin;
    instead unmatched lefts (incl. null/inverted bounds) return via a
    hash anti-join on ``left_id``. Shuffle volume is Σ span/w over
    both sides.
    """
    by = by or []
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left":
        if left_id is None:
            raise ValueError(
                "how='left' requires left_id (a column unique per left "
                "row) to identify unmatched intervals"
            )
        if left_id not in left.columns:
            raise ValueError(f"left side lacks left_id column {left_id!r}")
    if bounds not in ("closed", "open"):
        raise ValueError(f"bounds must be 'closed' or 'open', got {bounds!r}")
    l_lo, l_hi = left_bounds
    r_lo, r_hi = right_bounds
    for df, cols, side in ((left, [*by, l_lo, l_hi], "left"),
                           (right, [*by, r_lo, r_hi], "right")):
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"{side} side lacks columns {missing}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in {*by, r_lo, r_hi}
        ]
    # same duplicate-name rule as range_join: bounds export under
    # their own suffixed names (r11 review)
    right_cols = [c for c in right_cols if c not in (r_lo, r_hi)]

    to_num, unit_scale, integral = _range_domain(left.schema[l_lo].dataType)
    if bin_width is not None and bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width!r}")
    if bin_width is None:
        # adaptive width from the RIGHT side's span sketch (r6): both
        # sides explode, but the right side is the dimension-like one
        # by convention; the max-span clamp below still only covers
        # the sketched side, so a left interval wider than
        # max_bins * w falls back to the runtime guard's message
        w_num = _auto_bin_width(
            right, r_lo, r_hi, to_num, max_bins_per_interval
        )
        # ceil for the same clamp-invariant reason as range_join
        w = max(1, math.ceil(w_num)) if integral else max(w_num, 1e-12)
    else:
        w_num = float(bin_width) * unit_scale
        w = max(1, int(round(w_num))) if integral else max(w_num, 1e-12)

    def binned(df: DataFrame, lo: str, hi: str, prefix: str,
               payload: list) -> DataFrame:
        valid = (
            F.col(lo).isNotNull() & F.col(hi).isNotNull()
            & (F.col(lo) <= F.col(hi))
        )
        blo = F.floor(to_num(F.col(lo)) / F.lit(w))
        bhi = F.floor(to_num(F.col(hi)) / F.lit(w))
        # valid+fits -> bins; valid+too-wide -> raise; invalid -> null
        # (explode drops the row — unmatched lefts come back via the
        # anti-join branch below, never via explode_outer: left-outer
        # on EXPLODED rows would emit one null row per non-matching
        # bin instead of one per interval)
        seq = F.when(
            valid & (bhi - blo < F.lit(max_bins_per_interval)),
            F.sequence(blo, bhi),
        ).when(
            valid,
            F.raise_error(F.concat(
                F.lit(
                    "interval_join: interval spans more than "
                    f"{max_bins_per_interval} bins of width "
                    f"{w / unit_scale!r} — pass a larger bin_width "
                    "or raise max_bins_per_interval (interval ["
                ),
                F.col(lo).cast("string"), F.lit(", "),
                F.col(hi).cast("string"), F.lit("])"),
            )).cast("array<bigint>"),
        )
        cols = [
            *[F.col(k).alias(f"{prefix}k_{k}") for k in by],
            F.col(lo).alias(f"{prefix}lo"),
            F.col(hi).alias(f"{prefix}hi"),
            F.floor(to_num(F.col(lo)) / F.lit(w)).alias(f"{prefix}blo"),
            *[F.col(c).alias(f"{prefix}p_{c}") for c in payload],
        ]
        return df.select(*cols, F.explode(seq).alias(f"{prefix}bin"))

    li = binned(left, l_lo, l_hi, "__l", left.columns)
    ri = binned(right, r_lo, r_hi, "__r", right_cols)

    cond = li["__lbin"] == ri["__rbin"]
    for k in by:
        cond = cond & (li[f"__lk_{k}"] == ri[f"__rk_{k}"])
    if bounds == "closed":
        overlap = (li["__llo"] <= ri["__rhi"]) & (ri["__rlo"] <= li["__lhi"])
    else:
        overlap = (li["__llo"] < ri["__rhi"]) & (ri["__rlo"] < li["__lhi"])
    first_common = li["__lbin"] == F.greatest(li["__lblo"], ri["__rblo"])
    inner = li.join(ri, cond & overlap & first_common, "inner").select(
        *[li[f"__lp_{c}"].alias(c) for c in left.columns],
        ri["__rlo"].alias(f"{r_lo}{suffix}"),
        ri["__rhi"].alias(f"{r_hi}{suffix}"),
        *[ri[f"__rp_{c}"].alias(f"{c}{suffix}") for c in right_cols],
    )
    if how == "inner":
        return inner
    # left-outer: one null row per UNMATCHED left row — identified by
    # left_id (hash anti-join), since the exploded inner join has no
    # per-interval identity to dedupe null rows on
    matched_ids = inner.select(F.col(left_id).alias("__mid")).distinct()
    unmatched = left.join(
        matched_ids, left[left_id] == matched_ids["__mid"], "left_anti"
    )
    null_right = unmatched.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(right.schema[r_lo].dataType).alias(
            f"{r_lo}{suffix}"),
        F.lit(None).cast(right.schema[r_hi].dataType).alias(
            f"{r_hi}{suffix}"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_cols],
    )
    return inner.unionByName(null_right)


def session_ids(
    df: DataFrame,
    ts_col: str = "ts",
    by: list[str] | None = None,
    gap: Column | float = 1800.0,
    out_col: str = "session_id",
) -> DataFrame:
    """Row-level batch sessionization: assign every row a session id
    such that rows of the same ``by`` key whose timestamps are within
    ``gap`` of the previous row share a session — the event-level
    companion to the AGGREGATED session rollup
    (:func:`~..streaming.validate.session_event_counts`, which uses
    ``session_window`` and yields one row per session, losing the
    row-to-session mapping a pipeline needs to enrich events).

    Classic two-window formulation, ONE hash shuffle on the keys and
    a partition-local sort shared by both windows (lag and the
    running sum use the same (partition, order) spec, so Catalyst
    plans a single Window exchange+sort): ``new = (ts - lag(ts)) >
    gap``; ``session_index = sum(new) over (unbounded preceding)``.
    The id is ``(key..., session_index)`` rendered as a struct — 
    globally unique WITHIN a key; combine with the key columns for a
    cross-key identifier (done here via the struct).

    ``gap`` (number): in the ts column's native units — SECONDS for
    timestamps, DAYS for dates, the column's own units for numerics
    (same convention as ``range_join``'s bin_width); or any
    interval-typed Column. Nulls in ``ts_col`` sort first and join
    the first session of their key. With ``by=[]`` the window is a
    single-task global sort — supply keys at scale. Rows tied on (key, ts) always
    share a session (zero gap), but which of them the window visits
    first is plan-order-dependent — irrelevant here since a tie can
    never open a new session.
    """
    by = by or []
    to_num, unit_scale, _ = _range_domain(df.schema[ts_col].dataType)
    w = Window.partitionBy(*by).orderBy(F.col(ts_col))
    if isinstance(gap, Column):
        # interval-typed gap: diff on the ORIGINAL column (timestamp
        # subtraction yields an interval, comparable to gap directly)
        diff = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
        new_session = (diff > gap).cast("int")
    else:
        ts_n = to_num(F.col(ts_col))
        new_session = (
            ts_n - F.lag(ts_n).over(w) > F.lit(float(gap) * unit_scale)
        ).cast("int")
    idx = F.sum(F.coalesce(new_session, F.lit(0))).over(
        Window.partitionBy(*by).orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sid = F.struct(
        *[F.col(k).alias(f"k_{k}") for k in by], idx.alias("n")
    )
    return df.withColumn(out_col, sid)
