"""extensions/profiling.py — one-scan column profiling + moment-based
drift detection between table snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goodtables_pandas_py_spark.extensions.profiling import (
    column_profile,
    profile_drift,
)


@pytest.fixture()
def snap_a(spark):
    rows = [(i, float(i % 10), f"u{i % 5}", None if i % 10 == 0 else i)
            for i in range(100)]
    return spark.createDataFrame(rows, "id long, x double, cat string, opt long")


def test_column_profile_matches_duckdb_exact_metrics(spark, snap_a):
    """Exact metrics (n, nulls, mean, stddev, min, max) vs DuckDB on
    the same frame; approx_distinct within HLL tolerance."""
    import duckdb

    prof = {r["column"]: r for r in column_profile(snap_a).collect()}
    con = duckdb.connect()
    con.register("t", snap_a.toPandas())
    n, nn, mean, sd, mn, mx, nd = con.execute(
        "SELECT count(*), count(*) - count(x), avg(x), stddev_samp(x),"
        " min(x), max(x), count(DISTINCT x) FROM t"
    ).fetchone()
    p = prof["x"]
    assert p["n"] == n and p["n_null"] == nn
    assert abs(p["mean"] - mean) < 1e-9
    assert abs(p["stddev"] - sd) < 1e-9
    assert p["min_v"] == mn and p["max_v"] == mx
    assert abs(p["approx_distinct"] - nd) <= max(2, 0.15 * nd)
    # string column: numeric moments null, counts real
    c = prof["cat"]
    assert c["mean"] is None and c["n"] == 100 and c["n_null"] == 0
    # nullable column counts its nulls
    assert prof["opt"]["n_null"] == 10


def test_column_profile_single_job(spark, snap_a):
    """All metrics ride ONE aggregate — no per-column jobs."""
    plan = (
        column_profile(snap_a)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") <= 4, plan  # partial+final, 1 agg
    assert "Join" not in plan


def test_profile_drift_flags(spark, snap_a):
    # after-snapshot: half the rows, x shifted by +100, opt all null,
    # cat unchanged
    after_df = snap_a.where(F.col("id") < 40).select(
        "id",
        (F.col("x") + 100).alias("x"),
        "cat",
        F.lit(None).cast("long").alias("opt"),
    )
    drift = {
        r["column"]: r
        for r in profile_drift(
            column_profile(snap_a), column_profile(after_df)
        ).collect()
    }
    assert drift["x"]["mean_drift"] and drift["x"]["drifted"]
    assert drift["opt"]["null_rate_drift"]
    assert drift["id"]["row_count_drift"]          # 100 -> 40
    assert drift["cat"]["drifted"]                 # row count flag fires
    assert not drift["cat"]["mean_drift"]
    assert not drift["cat"]["null_rate_drift"]


def test_profile_drift_stable_snapshot_no_flags(spark, snap_a):
    drift = profile_drift(
        column_profile(snap_a), column_profile(snap_a)
    )
    assert drift.where(F.col("drifted")).count() == 0


def test_profile_drift_schema_change(spark, snap_a):
    after_df = snap_a.drop("opt").withColumn("fresh", F.lit(1))
    drift = {
        r["column"]: r
        for r in profile_drift(
            column_profile(snap_a), column_profile(after_df)
        ).collect()
    }
    assert drift["opt"]["schema_change"] == "removed"
    assert drift["fresh"]["schema_change"] == "added"
    assert drift["opt"]["drifted"] and drift["fresh"]["drifted"]


def test_column_profile_rejects_unknown_columns(spark, snap_a):
    with pytest.raises(ValueError, match="not in DataFrame"):
        column_profile(snap_a, ["nope"])
