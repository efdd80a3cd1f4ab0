"""extensions/temporal.py — as-of join.

Verification strategy: DuckDB has a NATIVE ASOF JOIN, so the Spark
implementation (union + window, zero join nodes) is checked against
it directly — the same oracle discipline as the registry, applied in
pytest because the testdata tables have no natural dimension side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goodtables_pandas_py_spark.extensions.temporal import asof_join


@pytest.fixture()
def quotes(spark):
    rows = [
        ("A", 10, 1.0), ("A", 20, 2.0), ("A", 20, 2.0), ("A", 50, 5.0),
        ("B", 15, 9.0),
    ]
    return spark.createDataFrame(rows, "sym string, ts long, px double")


@pytest.fixture()
def trades(spark):
    rows = [
        ("A", 5, 100), ("A", 10, 101), ("A", 25, 102), ("A", 60, 103),
        ("B", 14, 104), ("B", 15, 105), ("C", 30, 106),
    ]
    return spark.createDataFrame(rows, "sym string, ts long, qty long")


def test_asof_join_backward_inclusive(spark, trades, quotes):
    got = {
        r["qty"]: (r["ts_right"], r["px_right"])
        for r in asof_join(
            trades, quotes.distinct(), by=["sym"]
        ).collect()
    }
    assert got[100] == (None, None)      # before any quote
    assert got[101] == (10, 1.0)         # exact-ts quote matches (inclusive)
    assert got[102] == (20, 2.0)         # latest at-or-before 25
    assert got[103] == (50, 5.0)
    assert got[104] == (None, None)      # B's quote is at 15, trade at 14
    assert got[105] == (15, 9.0)
    assert got[106] == (None, None)      # key absent from right
    # left-outer: every trade survives
    assert len(got) == 7


def test_asof_join_matches_duckdb_native(spark, trades, quotes):
    """The engine-grade check: DuckDB's built-in ASOF JOIN on the
    same data must produce row-identical results."""
    import duckdb

    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.distinct().toPandas())
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT t.qty, q.ts, q.px
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.ts >= q.ts
            """
        ).fetchall()
    }
    got = {
        r["qty"]: (r["ts_right"], r["px_right"])
        for r in asof_join(trades, quotes.distinct(), by=["sym"]).collect()
    }
    assert got == want


def test_asof_join_property_matches_duckdb(spark):
    """Randomized parity with DuckDB ASOF JOIN over many keys/ts."""
    import random

    import duckdb

    rng = random.Random(42)
    left_rows = [
        (f"k{rng.randrange(5)}", rng.randrange(100), i)
        for i in range(120)
    ]
    right_rows = [
        (f"k{rng.randrange(5)}", ts, float(ts) * 10 + rng.randrange(3))
        for ts in rng.sample(range(100), 40)
    ]
    # unique (key, ts) on the right: same-instant duplicate winners are
    # implementation-defined on both engines, so exclude that case
    seen = set()
    right_rows = [
        r for r in right_rows
        if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    ldf = spark.createDataFrame(left_rows, "k string, ts long, lid long")
    rdf = spark.createDataFrame(right_rows, "k string, ts long, v double")

    con = duckdb.connect()
    con.register("l", ldf.toPandas())
    con.register("r", rdf.toPandas())
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            "SELECT l.lid, r.ts, r.v FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    got = {
        r["lid"]: (r["ts_right"], r["v_right"])
        for r in asof_join(ldf, rdf, by=["k"]).collect()
    }
    assert got == want


def test_asof_join_tolerance(spark, trades, quotes):
    got = {
        r["qty"]: r["px_right"]
        for r in asof_join(
            trades, quotes.distinct(), by=["sym"], tolerance=F.lit(5)
        ).collect()
    }
    assert got[101] == 1.0       # exact match within tolerance
    assert got[102] == 2.0       # 25 - 20 = 5 <= 5
    assert got[103] is None      # 60 - 50 = 10 > 5 -> voided


def test_asof_join_single_shuffle_no_join_node(spark, trades, quotes):
    plan = (
        asof_join(trades, quotes.distinct(), by=["sym"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan  # union+window, never a join
    # the distinct() on the right adds its own exchange; the as-of
    # machinery itself contributes exactly one (the window partition)
    plan2 = (
        asof_join(trades, quotes, by=["sym"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("Exchange") == 1, plan2


def test_asof_join_rejects_missing_columns(spark, trades):
    bad = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        asof_join(trades, bad, by=["sym"])
