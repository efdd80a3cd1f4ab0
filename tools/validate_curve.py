#!/usr/bin/env python
"""validate_table scale curve (r7 — VERDICT r6 item 2): the flagship
gets the same treatment as dedup/ANN/BPE. Replica-scaled lineitem at
N x sf0.1 through BOTH validation arms:

- **lexical**: the all-string contract (stringly rendition, full
  render->parse), the reference-parity worst case;
- **typed**: parquet stays typed, fast-path columns skip the
  roundtrip (r6).

At every point the compiled plan is asserted to keep its shape — ONE
FileScan feeding the fused projection — so "it scaled" can't mean
"it quietly became two scans". Output is one JSON line per run:

    python tools/validate_curve.py [--reps 10 20 40] [--skip-build]

Pass/fail rule of thumb: each arm should scale <= linearly in reps
(t_N / t_10 <= N/10 x ~1.2 slack); the typed/lexical ratio should
hold near its measured ~2x. Results land in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/validate_curve")


def build(spark, reps: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/lineitem_{reps}x.parquet"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    big = (
        li.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias(
                "l_orderkey"
            ),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .drop("rep")
    )
    big.repartition(32).write.mode("overwrite").parquet(out)
    return out


def assert_one_scan(wide, checks) -> None:
    """The fused validation job must read ONE FileScan regardless of
    scale (mirrors tests/test_plans.py::test_validation_fuses_to_
    single_scan, but re-checked at every curve point on the real
    replica table)."""
    from pyspark.sql import functions as F

    aggs = [
        F.count_if(F.col(c.mask_col)).alias(f"c{i}")
        for i, c in enumerate(checks)
    ]
    plan = (
        wide.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    )
    n = plan.count("FileScan")
    if n != 1:
        raise AssertionError(f"plan shape regressed: {n} FileScans")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, nargs="+", default=[10, 20, 40])
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    import goodtables_pandas_py_spark as gt
    from goodtables_pandas_py_spark.sources import (
        ensure_parallelism,
        stringly,
    )
    from goodtables_pandas_py_spark.validate import (
        _compile_table,
        validate_table,
    )
    from tools.scale_probe import lineitem_schema

    spark = gt.get_spark(app_name="gt-validate-curve")
    sch = lineitem_schema()
    points = []
    for reps in args.reps:
        path = build(spark, reps)
        entry = {"reps": reps}
        typed_df = ensure_parallelism(spark.read.parquet(path))
        entry["rows"] = typed_df.count()
        for arm, df in (
            ("typed", typed_df),
            ("lexical", stringly(typed_df)),
        ):
            wide, checks, _ = _compile_table(df, sch, False)
            assert_one_scan(wide, checks)
            t0 = time.time()
            v = validate_table(
                df, sch, resource="lineitem",
                cache_cols=["l_orderkey", "l_linenumber"],
            )
            entry[arm] = round(time.time() - t0, 2)
            entry[f"{arm}_errors"] = len(v.errors)
            if v.cached is not None:
                v.cached.unpersist()
        entry["ratio_lex_typed"] = round(
            entry["lexical"] / max(entry["typed"], 1e-9), 2
        )
        points.append(entry)
        print(json.dumps(entry), file=sys.stderr)
    base = points[0]
    print(
        json.dumps(
            {
                "metric": "validate_curve",
                "unit": "sec",
                "points": points,
                "linear_ok": all(
                    p[arm] / max(base[arm], 1e-9)
                    <= (p["reps"] / base["reps"]) * 1.2 + 0.2
                    for p in points[1:]
                    for arm in ("typed", "lexical")
                ),
                "loadavg": os.getloadavg()[0],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
