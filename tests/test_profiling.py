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


# --------------------------------------------------------- histogram + PSI

def test_value_histogram_matches_duckdb(spark, snap_a):
    import duckdb

    from goodtables_pandas_py_spark.extensions.profiling import value_histogram

    got = {
        r["bucket"]: r["n"]
        for r in value_histogram(snap_a, "x", 0.0, 10.0, bins=5).collect()
    }
    con = duckdb.connect()
    con.register("t", snap_a.toPandas())
    # DuckDB has no width_bucket; replicate the semantics in SQL:
    # underflow 0, overflow (incl. x == hi) bins+1, else linear bucket
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT CASE WHEN x < 0.0 THEN 0 WHEN x >= 10.0 THEN 6"
            " ELSE CAST(floor((x - 0.0) / 10.0 * 5) AS BIGINT) + 1 END AS b,"
            " count(*) FROM t WHERE x IS NOT NULL GROUP BY b"
        ).fetchall()
    }
    assert got == want


def test_psi_detects_shift(spark, snap_a):
    from goodtables_pandas_py_spark.extensions.profiling import (
        population_stability_index,
        value_histogram,
    )
    import pyspark.sql.functions as F

    h0 = value_histogram(snap_a, "x", 0.0, 10.0, bins=10)
    same = population_stability_index(h0, h0)
    assert abs(same) < 1e-9

    shifted = snap_a.select((F.col("x") + 4.0).alias("x"))
    h1 = value_histogram(shifted, "x", 0.0, 10.0, bins=10)
    moved = population_stability_index(h0, h1)
    assert moved > 0.25, moved   # "population changed" band

    # PSI vs a pure-Python recomputation on the same histograms
    import math

    hb = {r["bucket"]: r["n"] for r in h0.collect()}
    ha = {r["bucket"]: r["n"] for r in h1.collect()}
    tb, ta = sum(hb.values()), sum(ha.values())
    eps = 1e-6
    want = 0.0
    for k in set(hb) | set(ha):
        pb = max(hb.get(k, 0) / tb, eps)
        pa = max(ha.get(k, 0) / ta, eps)
        want += (pa - pb) * math.log(pa / pb)
    assert abs(moved - want) < 1e-9


def test_histogram_rejects_bad_args(spark, snap_a):
    from goodtables_pandas_py_spark.extensions.profiling import value_histogram

    with pytest.raises(ValueError, match="bins"):
        value_histogram(snap_a, "x", 0.0, 1.0, bins=0)
    with pytest.raises(ValueError, match="lo < hi"):
        value_histogram(snap_a, "x", 5.0, 5.0)


def test_column_profile_rejects_empty_column_list(spark, snap_a):
    from goodtables_pandas_py_spark.extensions.profiling import column_profile

    with pytest.raises(ValueError, match="no columns"):
        column_profile(snap_a, [])


# --------------------------------------------- review-finding regressions

def test_profile_drift_survives_empty_and_all_null_snapshots(spark, snap_a):
    """ANSI-mode divide-by-zero regression: an empty before-snapshot
    or an all-null column must yield null ratios (flags False), not
    kill the job."""
    from goodtables_pandas_py_spark.extensions.profiling import (
        column_profile, profile_drift,
    )

    empty = snap_a.where(F.lit(False))
    rows = profile_drift(
        column_profile(empty), column_profile(snap_a)
    ).collect()
    assert len(rows) == 4          # completes; no DIVIDE_BY_ZERO
    all_null = snap_a.select(F.lit(None).cast("double").alias("x"))
    rows2 = profile_drift(
        column_profile(all_null),
        column_profile(snap_a.select("x")),
    ).collect()
    assert len(rows2) == 1


def test_profile_drift_validates_ratio_threshold(spark, snap_a):
    from goodtables_pandas_py_spark.extensions.profiling import (
        column_profile, profile_drift,
    )

    prof = column_profile(snap_a)
    with pytest.raises(ValueError, match="max_distinct_ratio_change"):
        profile_drift(prof, prof, max_distinct_ratio_change=1.0)


def test_value_histogram_excludes_nan(spark):
    from goodtables_pandas_py_spark.extensions.profiling import value_histogram

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,), (None,)], "x double"
    )
    rows = value_histogram(df, "x", 0.0, 10.0, bins=5).collect()
    assert sum(r["n"] for r in rows) == 2
    assert all(r["bucket"] is not None for r in rows)


def test_column_profile_quantiles_near_duckdb_exact(spark, snap_a):
    import duckdb

    from goodtables_pandas_py_spark.extensions.profiling import column_profile

    prof = {r["column"]: r for r in column_profile(snap_a).collect()}
    con = duckdb.connect()
    con.register("t", snap_a.toPandas())
    p50, p95 = con.execute(
        "SELECT quantile_cont(x, 0.5), quantile_cont(x, 0.95) FROM t"
    ).fetchone()
    # percentile_approx is a sketch: assert within one bucket width
    assert abs(prof["x"]["p50"] - p50) <= 1.0
    assert abs(prof["x"]["p95"] - p95) <= 1.0
    assert prof["cat"]["p50"] is None


def test_top_values_basic(spark):
    from goodtables_pandas_py_spark.extensions.profiling import top_values

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", 1), ("b", None), (None, 1)],
        "s: string, x: int",
    )
    got = {
        (r["column"], r["value"]): (r["n"], r["rank"])
        for r in top_values(df, k=2).collect()
    }
    # s: b x3? no -> a:2, b:3... recount: s values a,a,b,b,b,None -> b:3, a:2
    assert got[("s", "b")] == (3, 1)
    assert got[("s", "a")] == (2, 2)
    # x values 1,2,1,1,None,1 -> "1":4, then tie None(1) vs "2"(1):
    # nulls-first tiebreak ranks NULL second
    assert got[("x", "1")] == (4, 1)
    assert got[("x", None)] == (1, 2)
    assert ("x", "2") not in got  # cut at k=2
    assert all(r[1] <= 2 for r in got.values())


def test_top_values_duckdb_parity(spark, tmp_path):
    import duckdb

    from goodtables_pandas_py_spark.extensions.profiling import top_values

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {
        (r["column"], r["value"], r["n"], r["rank"])
        for r in top_values(
            li, ["l_returnflag", "l_quantity"], k=3
        ).collect()
    }
    exp = set()
    con = duckdb.connect()
    for col in ["l_returnflag", "l_quantity"]:
        rows = con.execute(
            f"""SELECT CAST({col} AS VARCHAR) v, count(*) n
                FROM '/root/testdata/sf0.001/lineitem.parquet'
                GROUP BY 1 ORDER BY n DESC, v ASC NULLS FIRST LIMIT 3"""
        ).fetchall()
        for i, (v, n) in enumerate(rows):
            exp.add((col, v, n, i + 1))
    # value render parity: Spark casts doubles like 1.0 -> '1.0';
    # DuckDB CAST(1.0 AS VARCHAR) -> '1.0' as well for DOUBLE
    assert got == exp


def test_top_values_validates_args(spark):
    import pytest as _pytest

    from goodtables_pandas_py_spark.extensions.profiling import top_values

    df = spark.createDataFrame([("a",)], "s: string")
    with _pytest.raises(ValueError, match="not in DataFrame"):
        top_values(df, ["nope"])
    with _pytest.raises(ValueError, match="k must be"):
        top_values(df, ["s"], k=0)


def test_nan_does_not_poison_moments_or_silence_drift(spark):
    """r11 review (repro-confirmed): one NaN in the baseline made
    mean/stddev NaN, and since NaN > NaN is FALSE under Spark
    semantics, mean_drift could never fire again for that column.
    Moments now exclude NaN (value_histogram always did)."""
    from goodtables_pandas_py_spark.extensions.profiling import (
        column_profile,
        profile_drift,
    )

    before = spark.createDataFrame(
        [(float("nan"),), (1.0,), (2.0,), (3.0,)], "x double"
    )
    after = spark.createDataFrame(
        [(100.0,), (101.0,), (102.0,)], "x double"
    )
    pb = column_profile(before)
    row = pb.collect()[0]
    assert row["mean"] == 2.0           # NaN excluded, not propagated
    assert row["stddev"] == 1.0
    drift = profile_drift(pb, column_profile(after)).collect()[0]
    assert drift["mean_drift"] is True  # a 100-sigma shift FIRES
