"""Table profiling & drift detection (A4 family, SURVEY.md §2.6 —
beyond the reference, the data-quality feature a 100 TB pipeline runs
nightly: profile every snapshot in ONE scan, then compare profiles
across runs to catch silent upstream changes before they reach
training).

Scale shape: ``column_profile`` is a single wide aggregate (one scan,
map-side partial agg — cost independent of column count beyond the
expression width); drift comparison joins two tiny profile frames
(one row per column). Nothing here collects data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import NumericType


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: ``column, n, n_null, approx_distinct``,
    plus ``mean, stddev, min_v, max_v, p50, p95`` for numeric columns
    (null otherwise; quantiles via the percentile_approx sketch —
    one-pass, mergeable, the 100 TB-safe choice). ONE job, one scan —
    all metrics ride a single wide ``agg`` and unpivot via a literal
    explode (no shuffle beyond the final single-partition agg).

    ``approx_distinct`` is HyperLogLog++ (`approx_count_distinct`,
    default rsd ~5%) — the 100 TB-safe choice; exact distincts would
    shuffle every value.
    """
    cols = cols if cols is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    per_col = []
    for c in cols:
        numeric = isinstance(df.schema[c].dataType, NumericType)
        v = F.col(c)
        # NaN-exclude the moment aggregates (value_histogram already
        # does): avg/stddev/min/max PROPAGATE NaN, and a NaN baseline
        # mean/stddev makes every profile_drift comparison NaN — and
        # NaN > NaN is FALSE under Spark semantics, so mean_drift
        # could never fire again for that column (r11 review,
        # repro-confirmed)
        dv = (
            F.when(~F.isnan(v.cast("double")), v.cast("double"))
            if numeric
            else F.lit(None).cast("double")
        )
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n"),
                F.count_if(v.isNull()).alias("n_null"),
                F.approx_count_distinct(v).alias("approx_distinct"),
                F.avg(dv).alias("mean"),
                F.stddev_samp(dv).alias("stddev"),
                F.min(dv).alias("min_v"),
                F.max(dv).alias("max_v"),
                F.percentile_approx(dv, 0.5).alias("p50"),
                F.percentile_approx(dv, 0.95).alias("p95"),
            ).alias(f"__p_{c}")
        )
    row = df.agg(*per_col)
    return row.select(
        F.explode(F.array(*[F.col(f"__p_{c}") for c in cols])).alias("p")
    ).select("p.*")


def profile_drift(
    before: DataFrame,
    after: DataFrame,
    max_null_rate_delta: float = 0.01,
    max_mean_shift_stddevs: float = 3.0,
    max_distinct_ratio_change: float = 0.5,
    min_rows_ratio: float = 0.5,
    max_rows_ratio: float = 2.0,
) -> DataFrame:
    """Compare two :func:`column_profile` frames (before/after
    snapshots of the same table): one row per column with the deltas
    and boolean drift flags, ``drifted`` true when any flag fires.

    Flags (deequ-style anomaly checks, moment-based so the comparison
    needs only the two tiny profile frames — never the data):

    - ``null_rate_drift``: |null_rate_after − null_rate_before| >
      ``max_null_rate_delta``.
    - ``mean_drift``: |mean_after − mean_before| >
      ``max_mean_shift_stddevs`` × stddev_before (numeric columns;
      constant columns use the absolute difference vs 0 → any change
      flags).
    - ``distinct_drift``: approx-distinct ratio leaves
      [1−r, 1/(1−r)] for r = ``max_distinct_ratio_change``.
    - ``row_count_drift``: n_after/n_before outside
      [``min_rows_ratio``, ``max_rows_ratio``].

    Columns present in only one profile appear with ``drifted`` true
    and ``schema_change`` flagging the add/remove.
    """
    if not 0.0 < max_distinct_ratio_change < 1.0:
        raise ValueError(
            "max_distinct_ratio_change must be in (0, 1), got "
            f"{max_distinct_ratio_change!r}"
        )
    b = before.select(
        F.col("column"),
        *[F.col(c).alias(f"{c}_before")
          for c in ("n", "n_null", "approx_distinct", "mean", "stddev",
                    "min_v", "max_v", "p50", "p95")],
    )
    a = after.select(
        F.col("column"),
        *[F.col(c).alias(f"{c}_after")
          for c in ("n", "n_null", "approx_distinct", "mean", "stddev",
                    "min_v", "max_v", "p50", "p95")],
    )
    j = b.join(a, "column", "full_outer")
    # try_divide: zero denominators (empty snapshot, all-null column)
    # yield null -> flags coalesce to False instead of the job dying
    # with DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    null_rate_b = F.try_divide(F.col("n_null_before"), F.col("n_before"))
    null_rate_a = F.try_divide(F.col("n_null_after"), F.col("n_after"))
    null_flag = (
        F.abs(null_rate_a - null_rate_b) > F.lit(max_null_rate_delta)
    )
    mean_flag = (
        F.abs(F.col("mean_after") - F.col("mean_before"))
        > F.lit(max_mean_shift_stddevs)
        * F.greatest(F.col("stddev_before"), F.lit(0.0))
    )
    ratio = F.try_divide(
        F.col("approx_distinct_after"), F.col("approx_distinct_before")
    )
    r = float(max_distinct_ratio_change)
    distinct_flag = (ratio < F.lit(1.0 - r)) | (ratio > F.lit(1.0 / (1.0 - r)))
    rows_ratio = F.try_divide(F.col("n_after"), F.col("n_before"))
    rows_flag = (
        (rows_ratio < F.lit(min_rows_ratio))
        | (rows_ratio > F.lit(max_rows_ratio))
    )
    schema_change = F.when(
        F.col("n_before").isNull(), F.lit("added")
    ).when(F.col("n_after").isNull(), F.lit("removed"))
    flags = {
        "null_rate_drift": F.coalesce(null_flag, F.lit(False)),
        "mean_drift": F.coalesce(mean_flag, F.lit(False)),
        "distinct_drift": F.coalesce(distinct_flag, F.lit(False)),
        "row_count_drift": F.coalesce(rows_flag, F.lit(False)),
    }
    out = j.select(
        "column",
        F.col("n_before"), F.col("n_after"),
        (null_rate_a - null_rate_b).alias("null_rate_delta"),
        (F.col("mean_after") - F.col("mean_before")).alias("mean_delta"),
        (F.col("p50_after") - F.col("p50_before")).alias("p50_delta"),
        ratio.alias("distinct_ratio"),
        rows_ratio.alias("rows_ratio"),
        *[c.alias(name) for name, c in flags.items()],
        schema_change.alias("schema_change"),
    )
    any_flag = F.lit(False)
    for name in flags:
        any_flag = any_flag | F.col(name)
    return out.withColumn(
        "drifted", any_flag | F.col("schema_change").isNotNull()
    )


def value_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Fixed-bound equi-width histogram: ``(bucket, n)`` rows with
    bucket 0 = underflow (< lo), 1..bins = in-range, bins+1 =
    overflow (``>= hi`` — `width_bucket` puts values EQUAL to hi in
    the overflow bucket, so when taking bounds from a before
    profile, the max value itself lands in overflow on both sides —
    consistent bucketing, which is all PSI needs). One groupBy on a
    small key domain (map-side combine collapses everything to ≤
    bins+2 rows before the shuffle). Bounds are CALLER-FIXED so two
    snapshots bucket identically — take them from the BEFORE
    profile's min/max when comparing (bins drift otherwise).
    Nulls and NaNs are excluded (NaN would bucket to null and make
    a join-unmatchable histogram row; profile null rates via
    ``column_profile``).
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not lo < hi:
        raise ValueError("need lo < hi")
    v = F.col(col).cast("double")
    return (
        df.where(v.isNotNull() & ~F.isnan(v))
        .select(
            F.width_bucket(v, F.lit(float(lo)), F.lit(float(hi)),
                           F.lit(bins)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def population_stability_index(
    before: DataFrame,
    after: DataFrame,
    epsilon: float = 1e-6,
) -> float:
    """PSI between two :func:`value_histogram` frames over the SAME
    bounds/bins: Σ (p_a − p_b) · ln(p_a / p_b) with ``epsilon``
    flooring for empty buckets. Driver-side single-row result (the
    histograms are ≤ bins+2 rows). Common reading: < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 population changed.
    """
    import math

    # the histograms are <= bins+2 rows: collect each ONCE and finish
    # in Python — chaining Spark jobs here would re-evaluate the full
    # (lazy) histogram lineage per action, re-scanning the base table
    hb = {r["bucket"]: r["n"] for r in before.collect()}
    ha = {r["bucket"]: r["n"] for r in after.collect()}
    tb, ta = sum(hb.values()), sum(ha.values())
    if tb == 0 or ta == 0:
        raise ValueError("empty histogram (no non-null rows)")
    psi = 0.0
    for k in hb.keys() | ha.keys():
        pb = max(hb.get(k, 0) / tb, epsilon)
        pa = max(ha.get(k, 0) / ta, epsilon)
        psi += (pa - pb) * math.log(pa / pb)
    return psi


def top_values(
    df: DataFrame,
    cols: list[str] | None = None,
    k: int = 10,
    prune_salts: int | None = None,
) -> DataFrame:
    """Most-frequent values per column — the classic profiler
    companion to :func:`column_profile` (deequ/pandas-profiling both
    ship it): (column, value, n, rank) for the top ``k`` values of
    each profiled column, count-descending with value-ascending
    tiebreak (deterministic). Values render as strings (one uniform
    output schema across column types); nulls count as a value and
    appear as NULL.

    Scale shape: ONE scan exploding each row into (column, value)
    structs + ONE hash shuffle for the (column, value) count — not a
    groupBy per column — then the top-k selection reuses
    :func:`~..splits.top_k_per_group` (ranking window; pass
    ``prune_salts`` to pre-prune columns whose distinct-value count is
    itself huge — the window sorts each column's distinct values in
    one task otherwise)."""
    cols = cols if cols is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if k < 1:
        raise ValueError("k must be >= 1")
    from .splits import top_k_per_group

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    counts = pairs.groupBy("column", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # the selection's OWN rank — re-deriving it with a second window
    # duplicated the sort and had to stay byte-consistent with the
    # selection's ordering spec by hand (r11 review)
    top = top_k_per_group(
        counts, ["column"], "n", k,
        tiebreak=["value"], prune_salts=prune_salts, keep_rank="rank",
    )
    return top.select("column", "value", "n", "rank")
