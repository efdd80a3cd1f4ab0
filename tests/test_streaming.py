"""Streaming validation tests (X5): file-source micro-batch streams
with availableNow trigger + memory sink; results asserted against the
batch twin of each query (expression reuse is the design, so batch
equivalence IS the correctness criterion)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from goodtables_pandas_py_spark import streaming as xstream
from goodtables_pandas_py_spark.schema import TableSchema


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    """Typed events written as parquet for readStream."""
    d = tempfile.mkdtemp(prefix="gt-stream-")
    rows = []
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    for i in range(200):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=i * 3),
                i % 7,
                ["click", "view", "purchase"][i % 3],
                float(i % 50) - 5.0,  # negatives violate minimum=0
            )
        )
    # event-time columns must be TIMESTAMP (LTZ) — Spark rejects
    # watermarks on TIMESTAMP_NTZ; session tz is UTC so wall == UTC
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    df.coalesce(2).write.mode("overwrite").parquet(d)
    return d


SCHEMA = TableSchema.from_descriptor(
    {
        "fields": [
            {"name": "event_id", "type": "integer", "constraints": {"required": True}},
            {"name": "event_type", "type": "string",
             "constraints": {"enum": ["click", "view", "purchase", "signup"]}},
            {"name": "value", "type": "number", "constraints": {"minimum": 0}},
        ]
    }
)


def _run_stream(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_error_rate_windows_match_batch(spark, event_stream_dir):
    batch = spark.read.parquet(event_stream_dir)
    stream = (
        spark.readStream.schema(batch.schema).parquet(event_stream_dir)
    )
    checked = xstream.validate_stream(stream, SCHEMA)
    windowed = xstream.error_rate_windows(
        checked, "ts", "60 minutes", watermark="0 seconds"
    )
    got = _run_stream(spark, windowed, "err_windows").collect()

    batch_checked = xstream.validate_stream(batch, SCHEMA)
    expected = (
        batch_checked.groupBy(F.window("ts", "60 minutes").alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("__viol__value__minimum")).alias("n_value__minimum"),
        )
        .collect()
    )
    gmap = {r["window"]["start"]: (r["n_rows"], r["n_value__minimum"]) for r in got}
    emap = {r["window"]["start"]: (r["n_rows"], r["n_value__minimum"]) for r in expected}
    assert gmap == emap
    assert sum(v[1] for v in emap.values()) > 0  # violations actually present


def test_stream_sessions_match_batch(spark, event_stream_dir):
    batch = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(event_stream_dir)
    sess = xstream.session_event_counts(stream, "ts", "user_id", gap="10 minutes")
    got = _run_stream(spark, sess, "sessions")
    g = got.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    e = (
        batch.groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, e.collect()))


def test_stream_fk_foreach_batch(spark, event_stream_dir):
    batch = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(event_stream_dir)
    parent = spark.createDataFrame([(i,) for i in range(5)], "user_id long")

    seen: list[int] = []

    def on_viol(viol, batch_id):
        seen.extend(r["user_id"] for r in viol.collect())

    handler = xstream.fk_check_foreach_batch(
        parent, ["user_id"], ["user_id"], on_viol
    )
    q = (
        stream.writeStream.foreachBatch(handler)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # users 5 and 6 missing from parent
    assert sorted(set(seen)) == [5, 6]
