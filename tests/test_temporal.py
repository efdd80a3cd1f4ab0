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


# ---------------------------------------------------------------- range_join

from goodtables_pandas_py_spark.extensions.temporal import range_join  # noqa: E402


@pytest.fixture()
def ip_blocks(spark):
    # keyed interval table with overlaps, touching bounds, an
    # inverted interval, and a null bound
    rows = [
        ("us", 0, 10, "a"), ("us", 10, 20, "b"), ("us", 5, 6, "c"),
        ("eu", 0, 100, "d"), ("eu", 50, 40, "bad"), ("eu", None, 10, "nul"),
    ]
    return spark.createDataFrame(
        rows, "region string, lo long, hi long, block string"
    )


@pytest.fixture()
def lookups(spark):
    rows = [
        ("us", 10, 1), ("us", 5, 2), ("us", 21, 3),
        ("eu", 45, 4), ("xx", 5, 5), ("us", None, 6),
    ]
    return spark.createDataFrame(rows, "region string, v long, qid long")


def _duck_range(ldf, rdf, how, lo_cmp=">=", hi_cmp="<="):
    import duckdb

    con = duckdb.connect()
    con.register("p", ldf.toPandas())
    con.register("iv", rdf.toPandas())
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return {
        tuple(r)
        for r in con.execute(
            f"SELECT p.qid, iv.lo, iv.hi, iv.block FROM p {join} iv"
            f" ON p.region = iv.region AND p.v {lo_cmp} iv.lo"
            f" AND p.v {hi_cmp} iv.hi"
        ).fetchall()
    }


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("bin_width", [None, 1, 3, 1000])
def test_range_join_matches_duckdb(spark, lookups, ip_blocks, how, bin_width):
    """Engine-grade oracle: DuckDB's native inequality join, across
    bin widths (results must be bin-width-invariant) and join modes."""
    got = {
        (r["qid"], r["lo_right"], r["hi_right"], r["block_right"])
        for r in range_join(
            lookups, ip_blocks, "v", "lo", "hi", by=["region"],
            how=how, bin_width=bin_width,
        ).collect()
    }
    assert got == _duck_range(lookups, ip_blocks, how)


@pytest.mark.parametrize(
    "bounds,lo_cmp,hi_cmp",
    [("closed", ">=", "<="), ("left_closed", ">=", "<"),
     ("right_closed", ">", "<="), ("open", ">", "<")],
)
def test_range_join_bounds_modes(spark, lookups, ip_blocks, bounds, lo_cmp,
                                 hi_cmp):
    got = {
        (r["qid"], r["lo_right"], r["hi_right"], r["block_right"])
        for r in range_join(
            lookups, ip_blocks, "v", "lo", "hi", by=["region"],
            bounds=bounds, bin_width=2,
        ).collect()
    }
    assert got == _duck_range(lookups, ip_blocks, "inner", lo_cmp, hi_cmp)


def test_range_join_property_matches_duckdb(spark):
    """Randomized parity incl. negative values and double points."""
    import random

    rng = random.Random(7)
    pts = [
        (f"k{rng.randrange(4)}", rng.uniform(-50, 150), i) for i in range(150)
    ]
    ivs = []
    for j in range(60):
        lo = rng.uniform(-60, 140)
        ivs.append((f"k{rng.randrange(4)}", lo, lo + rng.uniform(0, 30), j))
    ldf = spark.createDataFrame(pts, "region string, v double, qid long")
    rdf = spark.createDataFrame(ivs, "region string, lo double, hi double, block long")
    got = {
        (r["qid"], r["lo_right"], r["hi_right"], r["block_right"])
        for r in range_join(
            ldf, rdf, "v", "lo", "hi", by=["region"], how="left"
        ).collect()
    }
    assert got == _duck_range(ldf, rdf, "left")


def test_range_join_timestamp_domain(spark):
    """Timestamp points/bounds: bin_width is seconds; predicate
    compares real timestamps (no float drift)."""
    from datetime import datetime

    from datetime import timedelta

    base = datetime(2024, 1, 1)
    pts = [(base + timedelta(seconds=s), s) for s in (0, 30, 90, 200)]
    ivs = [
        (datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 1, 0), "w1"),
        (datetime(2024, 1, 1, 0, 1, 30), datetime(2024, 1, 1, 0, 3, 0), "w2"),
    ]
    ldf = spark.createDataFrame(pts, "ts timestamp, qid long")
    rdf = spark.createDataFrame(ivs, "lo timestamp, hi timestamp, name string")
    got = {
        (r["qid"], r["name_right"])
        for r in range_join(
            ldf, rdf, "ts", "lo", "hi", bin_width=45.0
        ).collect()
    }
    assert got == {(0, "w1"), (30, "w1"), (90, "w2")}


def test_range_join_plans_hash_join_not_nested_loop(spark, lookups, ip_blocks):
    """The whole point: the physical plan must be a shuffled
    hash/sort-merge equi-join, never BroadcastNestedLoopJoin or
    CartesianProduct."""
    plan = (
        range_join(lookups, ip_blocks, "v", "lo", "hi", by=["region"],
                   bin_width=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


def test_range_join_wide_interval_raises(spark, lookups):
    wide = spark.createDataFrame(
        [("us", 0, 10_000_000, "huge")],
        "region string, lo long, hi long, block string",
    )
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(
            lookups, wide, "v", "lo", "hi", by=["region"], bin_width=1,
            max_bins_per_interval=100,
        ).collect()


def test_range_join_rejects_bad_args(spark, lookups, ip_blocks):
    with pytest.raises(ValueError, match="how"):
        range_join(lookups, ip_blocks, "v", "lo", "hi", how="outer")
    with pytest.raises(ValueError, match="bounds"):
        range_join(lookups, ip_blocks, "v", "lo", "hi", bounds="sideways")
    with pytest.raises(ValueError, match="lacks columns"):
        range_join(lookups, lookups, "v", "lo", "hi")


# -------------------------------------------------------------- interval_join

from goodtables_pandas_py_spark.extensions.temporal import interval_join  # noqa: E402


@pytest.fixture()
def sessions(spark):
    rows = [
        ("u1", 0, 10, 1), ("u1", 5, 25, 2), ("u1", 40, 41, 3),
        ("u2", 0, 100, 4), ("u2", 50, 40, 5),   # inverted -> matches nothing
    ]
    return spark.createDataFrame(rows, "user string, lo long, hi long, sid long")


@pytest.fixture()
def outages(spark):
    rows = [
        ("u1", 8, 12, "o1"), ("u1", 24, 30, "o2"), ("u1", 41, 50, "o3"),
        ("u2", 99, 200, "o4"), ("u2", None, 5, "onull"),
    ]
    return spark.createDataFrame(rows, "user string, lo long, hi long, oid string")


def _duck_overlap(ldf, rdf, how, op="<="):
    import duckdb

    con = duckdb.connect()
    con.register("l", ldf.toPandas())
    con.register("r", rdf.toPandas())
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return {
        tuple(t)
        for t in con.execute(
            f"SELECT l.sid, r.oid FROM l {join} r"
            f" ON l.user = r.user AND l.lo {op} r.hi AND r.lo {op} l.hi"
        ).fetchall()
    }


@pytest.mark.parametrize("bin_width", [None, 1, 7, 1000])
def test_interval_join_matches_duckdb(spark, sessions, outages, bin_width):
    """Each overlapping pair exactly once, across bin widths — the
    first-common-bin dedup at work (session u1#2 spans bins shared
    with o1 under small widths)."""
    rows = interval_join(
        sessions, outages, ("lo", "hi"), ("lo", "hi"), by=["user"],
        bin_width=bin_width,
    ).collect()
    got = [(r["sid"], r["oid_right"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == _duck_overlap(sessions, outages, "inner")


def test_interval_join_left_semantics(spark, sessions, outages):
    """how='left': every left row exactly once when unmatched —
    including multi-bin unmatched intervals and invalid bounds."""
    rows = interval_join(
        sessions, outages, ("lo", "hi"), ("lo", "hi"), by=["user"],
        how="left", left_id="sid", bin_width=2,
    ).collect()
    got = {(r["sid"], r["oid_right"]) for r in rows}
    assert got == _duck_overlap(sessions, outages, "left")
    # the inverted-bounds session survives as unmatched, exactly once
    assert sum(1 for r in rows if r["sid"] == 5) == 1


def test_interval_join_open_bounds(spark, sessions, outages):
    got = {
        (r["sid"], r["oid_right"])
        for r in interval_join(
            sessions, outages, ("lo", "hi"), ("lo", "hi"), by=["user"],
            bounds="open", bin_width=3,
        ).collect()
    }
    assert got == _duck_overlap(sessions, outages, "inner", op="<")
    # touching endpoints (session 40-41 vs outage 41-50) excluded
    assert (3, "o3") not in got


def test_interval_join_property_matches_duckdb(spark):
    import random

    rng = random.Random(11)
    ls, rs = [], []
    for i in range(80):
        lo = rng.uniform(-40, 90)
        ls.append((f"k{rng.randrange(3)}", lo, lo + rng.uniform(0, 25), i))
    for j in range(60):
        lo = rng.uniform(-50, 100)
        rs.append((f"k{rng.randrange(3)}", lo, lo + rng.uniform(0, 10), f"o{j}"))
    ldf = spark.createDataFrame(ls, "user string, lo double, hi double, sid long")
    rdf = spark.createDataFrame(rs, "user string, lo double, hi double, oid string")
    got = [
        (r["sid"], r["oid_right"])
        for r in interval_join(
            ldf, rdf, ("lo", "hi"), ("lo", "hi"), by=["user"],
            how="left", left_id="sid",
        ).collect()
    ]
    assert len(got) == len(set(got))
    assert set(got) == _duck_overlap(ldf, rdf, "left")


def test_interval_join_plans_hash_join(spark, sessions, outages):
    plan = (
        interval_join(sessions, outages, ("lo", "hi"), ("lo", "hi"),
                      by=["user"], bin_width=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_join_rejects_bad_args(spark, sessions, outages):
    with pytest.raises(ValueError, match="left_id"):
        interval_join(sessions, outages, ("lo", "hi"), ("lo", "hi"),
                      how="left")
    with pytest.raises(ValueError, match="lacks left_id"):
        interval_join(sessions, outages, ("lo", "hi"), ("lo", "hi"),
                      how="left", left_id="nope")
    with pytest.raises(ValueError, match="lacks columns"):
        interval_join(sessions, outages, ("lo", "wrong"), ("lo", "hi"))


# ---------------------------------------------------------------- session_ids

from goodtables_pandas_py_spark.extensions.temporal import session_ids  # noqa: E402


def test_session_ids_basic(spark):
    rows = [
        ("u1", 0, 0), ("u1", 100, 1), ("u1", 2000, 2), ("u1", 2100, 3),
        ("u2", 50, 4),
    ]
    df = spark.createDataFrame(rows, "user string, ts long, eid long")
    got = {
        r["eid"]: (r["session_id"]["k_user"], r["session_id"]["n"])
        for r in session_ids(df, "ts", by=["user"], gap=500).collect()
    }
    assert got[0] == ("u1", 0) and got[1] == ("u1", 0)   # within gap
    assert got[2] == ("u1", 1) and got[3] == ("u1", 1)   # new session
    assert got[4] == ("u2", 0)


def test_session_ids_matches_duckdb(spark):
    """Parity with the classic SQL two-window formulation in DuckDB."""
    import random

    import duckdb

    rng = random.Random(5)
    rows = [
        (f"u{rng.randrange(4)}", rng.randrange(10_000), i) for i in range(300)
    ]
    # unique (user, ts): equal timestamps make lag order ambiguous on
    # both engines
    seen, uniq = set(), []
    for u, ts, i in rows:
        if (u, ts) not in seen:
            seen.add((u, ts))
            uniq.append((u, ts, i))
    df = spark.createDataFrame(uniq, "user string, ts long, eid long")
    got = {
        r["eid"]: r["session_id"]["n"]
        for r in session_ids(df, "ts", by=["user"], gap=300).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT eid, sum(new) OVER (PARTITION BY user ORDER BY ts"
            " ROWS UNBOUNDED PRECEDING) AS sid FROM ("
            " SELECT eid, user, ts, CASE WHEN ts - lag(ts) OVER"
            " (PARTITION BY user ORDER BY ts) > 300 THEN 1 ELSE 0 END AS new"
            " FROM t)"
        ).fetchall()
    }
    assert got == want


def test_session_ids_timestamp_and_interval_gap(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(minutes=m), m) for m in (0, 10, 60, 65)]
    df = spark.createDataFrame(rows, "ts timestamp, eid long")
    # numeric gap: seconds
    got_num = {
        r["eid"]: r["session_id"]["n"]
        for r in session_ids(df, "ts", gap=1800.0).collect()
    }
    # interval gap column: same semantics
    got_iv = {
        r["eid"]: r["session_id"]["n"]
        for r in session_ids(
            df, "ts", gap=F.expr("INTERVAL 30 MINUTES")
        ).collect()
    }
    assert got_num == got_iv == {0: 0, 10: 0, 60: 1, 65: 1}


def test_session_ids_single_shuffle(spark):
    df = spark.createDataFrame(
        [("u1", 0, 0), ("u1", 100, 1)], "user string, ts long, eid long"
    )
    plan = (
        session_ids(df, "ts", by=["user"], gap=500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag and the running sum share (partition, order): ONE exchange
    assert plan.count("Exchange") == 1, plan


def test_range_join_keyless(spark):
    """by=[] — global interval lookup (e.g. a one-dimensional
    threshold table) still plans and matches DuckDB."""
    pts = spark.createDataFrame([(5, 1), (15, 2), (99, 3)], "v long, qid long")
    iv = spark.createDataFrame(
        [(0, 10, "low"), (10, 20, "mid")], "lo long, hi long, tier string"
    )
    got = {
        (r["qid"], r["tier_right"])
        for r in range_join(pts, iv, "v", "lo", "hi", bin_width=5).collect()
    }
    assert got == {(1, "low"), (2, "mid")}


def test_binned_joins_reject_nonpositive_bin_width(spark, lookups, ip_blocks):
    with pytest.raises(ValueError, match="bin_width"):
        range_join(lookups, ip_blocks, "v", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(ip_blocks, ip_blocks, ("lo", "hi"), ("lo", "hi"),
                      bin_width=-3.0)


def test_range_join_estimate_ignores_inverted_intervals(spark, lookups):
    """bin_width=None must estimate from VALID intervals only — an
    inverted interval previously drove the average span negative,
    collapsing w to 1e-12 and raising on every valid interval."""
    iv = spark.createDataFrame(
        [("us", 0, 10, "ok"), ("us", 1000, 0, "inverted")],
        "region string, lo long, hi long, block string",
    )
    got = {
        (r["qid"], r["block_right"])
        for r in range_join(
            lookups, iv, "v", "lo", "hi", by=["region"]
        ).collect()
    }
    assert got == {(1, "ok"), (2, "ok")}
    # interval_join twin
    spans = spark.createDataFrame(
        [("us", 5, 8, 1)], "region string, lo long, hi long, sid long"
    )
    got2 = {
        (r["sid"], r["block_right"])
        for r in interval_join(
            spans, iv, ("lo", "hi"), ("lo", "hi"), by=["region"]
        ).collect()
    }
    assert got2 == {(1, "ok")}


def test_asof_join_no_duplicate_ts_column(spark, trades, quotes):
    """right_cols explicitly naming ts_col must not duplicate
    <ts>_right (it is always exported from the match struct)."""
    out = asof_join(
        trades, quotes.distinct(), by=["sym"], right_cols=["ts", "px"]
    )
    assert out.columns.count("ts_right") == 1, out.columns
    assert "px_right" in out.columns


def test_range_join_validates_point_side_columns(spark, lookups, ip_blocks):
    with pytest.raises(ValueError, match="points side lacks"):
        range_join(lookups, ip_blocks, "typo", "lo", "hi", by=["region"])
    with pytest.raises(ValueError, match="left side lacks"):
        asof_join(
            spark.createDataFrame([(1,)], "x long"), ip_blocks.select(
                F.col("region"), F.col("lo").alias("ts"), "block"
            ), by=["region"],
        )


# ---------------------------------------------------- adaptive bin width (r6)

from goodtables_pandas_py_spark.extensions.temporal import (  # noqa: E402
    _auto_bin_width,
)


def _ident(c):
    return c


def test_auto_bin_width_uniform_spans_is_typical_span(spark):
    iv = spark.createDataFrame(
        [("a", 0, 10), ("a", 100, 110), ("a", 200, 210)],
        "k string, lo long, hi long",
    )
    w = _auto_bin_width(iv, "lo", "hi", _ident, 4096)
    assert w == pytest.approx(10.0)


def test_auto_bin_width_left_skew_uses_median_not_mean(spark):
    # 4 degenerate pings + 6 wide sessions: mean span = 6 -> every
    # wide interval would explode into ~1.7x the bins it needs;
    # p50 = 10 is the width of the MAJORITY population
    rows = [("a", i, i) for i in range(4)] + [
        ("a", 100 * i, 100 * i + 10) for i in range(1, 7)
    ]
    iv = spark.createDataFrame(rows, "k string, lo long, hi long")
    w = _auto_bin_width(iv, "lo", "hi", _ident, 4096)
    assert w == pytest.approx(10.0)  # median, NOT the dragged-down mean 6.0


def test_auto_bin_width_tail_mass_bounds_explode_volume(spark):
    # many tiny + few huge (mass in the tail): p50 = 1 would explode
    # the huge intervals; the mean/4 floor keeps sum(span)/w <= 4N
    rows = [("a", i * 10, i * 10 + 1) for i in range(100)] + [
        ("a", 10_000 * i, 10_000 * i + 5_000) for i in range(1, 4)
    ]
    iv = spark.createDataFrame(rows, "k string, lo long, hi long")
    w = _auto_bin_width(iv, "lo", "hi", _ident, 4096)
    mean = (100 * 1 + 3 * 5000) / 103
    assert w == pytest.approx(mean / 4.0)
    assert w > 1.0  # not the median


def test_auto_bin_width_outlier_clamp_prevents_max_bins_raise(spark):
    # one huge interval among tiny ones: the clamp must guarantee
    # max_span/w <= max_bins - 2 so the runtime guard can't fire
    rows = [("a", i, i + 1, f"t{i}") for i in range(50)] + [
        ("a", 0, 1_000_000, "huge")
    ]
    iv = spark.createDataFrame(rows, "k string, lo long, hi long, block string")
    w = _auto_bin_width(iv, "lo", "hi", _ident, 100)
    assert w >= 1_000_000 / 98
    # end-to-end: auto width completes (the old mean estimate ~19k
    # was fine here, but bin_width=1 equivalents raised) and matches
    # an explicit safe width exactly
    pts = spark.createDataFrame(
        [("a", 5, 1), ("a", 999_999, 2), ("a", 2_000_000, 3)],
        "k string, v long, qid long",
    )
    auto = {
        (r["qid"], r["block_right"])
        for r in range_join(
            pts, iv, "v", "lo", "hi", by=["k"], max_bins_per_interval=100
        ).collect()
    }
    explicit = {
        (r["qid"], r["block_right"])
        for r in range_join(
            pts, iv, "v", "lo", "hi", by=["k"], bin_width=50_000
        ).collect()
    }
    assert auto == explicit and (2, "huge") in auto


def test_auto_bin_width_degenerate_and_empty(spark):
    empty = spark.createDataFrame([], "k string, lo long, hi long")
    assert _auto_bin_width(empty, "lo", "hi", _ident, 4096) == 1.0
    zeros = spark.createDataFrame(
        [("a", 5, 5), ("a", 9, 9)], "k string, lo long, hi long"
    )
    assert _auto_bin_width(zeros, "lo", "hi", _ident, 4096) == 1.0
    with pytest.raises(ValueError, match="max_bins_per_interval"):
        _auto_bin_width(zeros, "lo", "hi", _ident, 2)


def test_interval_join_auto_width_parity_on_skewed_spans(spark):
    """Left-skewed spans (zero-length pings + wide sessions): auto
    width must produce the identical result set as explicit widths —
    the adaptive choice is a pure performance knob."""
    import duckdb

    left = spark.createDataFrame(
        [("u1", 0, 0, 1), ("u1", 10, 40, 2), ("u1", 35, 90, 3),
         ("u2", 0, 50, 4), ("u2", 200, 200, 5)],
        "user string, lo long, hi long, sid long",
    )
    right_rows = [("u1", i, i, f"p{i}") for i in range(0, 100, 7)] + [
        ("u1", 20, 80, "wide1"), ("u2", 40, 60, "wide2"),
        ("u2", 190, 210, "wide3"),
    ]
    right = spark.createDataFrame(
        right_rows, "user string, lo long, hi long, oid string"
    )
    con = duckdb.connect()
    con.register("left_t", left.toPandas())
    con.register("right_t", right.toPandas())
    expected = {
        tuple(r) for r in con.sql(
            """SELECT l.sid, r.oid FROM left_t l JOIN right_t r
               ON l."user" = r."user" AND l.lo <= r.hi AND r.lo <= l.hi"""
        ).fetchall()
    }
    for bw in (None, 5, 100):
        got = {
            (r["sid"], r["oid_right"])
            for r in interval_join(
                left, right, ("lo", "hi"), ("lo", "hi"), by=["user"],
                bin_width=bw,
            ).collect()
        }
        assert got == expected, (bw, got ^ expected)


def test_auto_width_ceil_never_trips_max_bins_guard(spark):
    """r7 ADVICE regression: on an integral domain, banker's rounding
    of the auto width (2.5 -> 2) could sink it below the
    max_span/(max_bins-2) clamp and trip the max_bins_per_interval
    guard on a valid auto-width run. Crafted so w_num is exactly 2.5:
    nine zero-span intervals (p50=0) + one span-25 interval with
    max_bins=12 (clamp 25/10 = 2.5). round->2 explodes the wide
    interval into 13 bins (raise); ceil->3 keeps it at <=12."""
    ivs = [("k", i, i) for i in range(9)] + [("k", 0, 25)]
    intervals = spark.createDataFrame(ivs, "g string, lo long, hi long")
    points = spark.createDataFrame(
        [("k", 12, 1)], "g string, v long, pid long"
    )
    got = range_join(
        points, intervals, point_col="v", by=["g"],
        max_bins_per_interval=12,
    ).collect()
    assert {(r["pid"], r["lo_right"], r["hi_right"]) for r in got} == {
        (1, 0, 25)
    }


def test_asof_join_null_right_ts_never_matches(spark):
    """r11 review regression: a right row with a NULL timestamp sorted
    FIRST in the window (NULLS FIRST) and its non-null payload struct
    matched as the 'latest at or before' row for every left row
    preceding the first real right row — silently violating left-outer
    semantics. NULL-ts right rows must be ignored entirely."""
    left = spark.createDataFrame(
        [("A", 5, 1), ("A", 50, 2)], "sym string, ts long, qty long"
    )
    right = spark.createDataFrame(
        [("A", None, "NULLTS"), ("A", 40, "REAL")],
        "sym string, ts long, val string",
    )
    got = {
        r["qty"]: (r["ts_right"], r["val_right"])
        for r in asof_join(left, right, by=["sym"]).collect()
    }
    assert got[1] == (None, None)   # nothing at or before ts=5
    assert got[2] == (40, "REAL")   # the real row still matches


def test_asof_null_by_keys_never_match(spark):
    """r11 review: the window's partitionBy GROUPS null keys, so a
    NULL-keyed event silently inherited the latest NULL-keyed
    dimension row — now null by keys never match (SQL join-key
    semantics, same as range_join and DuckDB's native ASOF)."""
    from goodtables_pandas_py_spark.extensions.temporal import asof_join

    left = spark.createDataFrame(
        [(None, 10, "e1"), ("a", 10, "e2")],
        "k string, ts int, ev string",
    )
    right = spark.createDataFrame(
        [(None, 5, "garbage"), ("a", 5, "good")],
        "k string, ts int, val string",
    )
    got = {
        r["ev"]: r["val_right"]
        for r in asof_join(left, right, ts_col="ts", by=["k"]).collect()
    }
    assert got == {"e1": None, "e2": "good"}


def test_range_join_right_cols_bounds_filtered(spark):
    """r11 review: a user-supplied right_cols naming the bounds
    columns emitted DUPLICATE output names (the bounds always export
    as <lo>/<hi><suffix>) — they are now filtered like asof's ts."""
    from goodtables_pandas_py_spark.extensions.temporal import (
        interval_join,
        range_join,
    )

    pts = spark.createDataFrame([(5, "p1")], "x int, pid string")
    ivs = spark.createDataFrame(
        [(0, 10, "A")], "lo int, hi int, owner string"
    )
    out = range_join(
        pts, ivs, point_col="x", right_cols=["lo", "owner"],
    )
    assert sorted(out.columns) == sorted(
        ["x", "pid", "lo_right", "hi_right", "owner_right"]
    )
    assert out.count() == 1

    li = spark.createDataFrame([(1, 4, "L")], "lo int, hi int, lid string")
    ri = spark.createDataFrame([(2, 6, "R")], "lo int, hi int, rid string")
    out2 = interval_join(
        li, ri, left_bounds=("lo", "hi"), right_bounds=("lo", "hi"),
        right_cols=["hi", "rid"],
    )
    assert len(out2.columns) == len(set(out2.columns))
    assert out2.count() == 1
