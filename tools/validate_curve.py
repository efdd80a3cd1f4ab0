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


def wide_descriptor(n_fields: int) -> list[dict]:
    """A synthetic 100+-field descriptor cycling through the six field
    archetypes (typed int+required, number+range, enum, pattern, date,
    boolean) — the VERDICT r7 item 2 wide-schema probe shape."""
    fields = []
    for i in range(n_fields):
        k = i % 6
        name = f"f{i:03d}"
        fields.append(
            {
                0: {"name": name, "type": "integer",
                    "constraints": {"required": True}},
                1: {"name": name, "type": "number",
                    "constraints": {"minimum": 0, "maximum": 1000}},
                2: {"name": name, "type": "string",
                    "constraints": {"enum": ["aa", "bb", "cc"]}},
                3: {"name": name, "type": "string",
                    "constraints": {"pattern": "[a-z]+-[0-9]+"}},
                4: {"name": name, "type": "date"},
                5: {"name": name, "type": "boolean"},
            }[k]
        )
    return fields


def build_wide(spark, n_fields: int, rows: int) -> str:
    """Deterministic wide table (typed columns; the lexical arm
    stringifies downstream)."""
    from pyspark.sql import functions as F

    out = f"{WORK}/wide_{n_fields}_{rows}.parquet"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    cols = []
    for i in range(n_fields):
        k = i % 6
        name = f"f{i:03d}"
        if k == 0:
            cols.append((F.col("id") * (i + 1) % 1000).cast("long").alias(name))
        elif k == 1:
            cols.append((F.col("id") % 997 / 7.0).alias(name))
        elif k == 2:
            cols.append(
                F.element_at(
                    F.array(F.lit("aa"), F.lit("bb"), F.lit("cc")),
                    (F.col("id") % 3 + 1).cast("int"),
                ).alias(name)
            )
        elif k == 3:
            cols.append(
                F.concat(
                    F.lit("ab-"), (F.col("id") % 100).cast("string")
                ).alias(name)
            )
        elif k == 4:
            cols.append(
                F.date_add(
                    F.lit("2020-01-01"), (F.col("id") % 365).cast("int")
                ).alias(name)
            )
        else:
            cols.append((F.col("id") % 2 == 0).alias(name))
    (
        spark.range(rows)
        .select(*cols)
        .repartition(8)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def codegen_spans(job) -> list[int]:
    """The *(n) markers of the EXECUTED plan — [] means the whole job
    ran interpreted (spark.sql.codegen.maxFields fallback)."""
    import re

    plan = job._jdf.queryExecution().executedPlan().toString()
    return sorted({int(m) for m in re.findall(r"\*\((\d+)\)", plan)})


def run_wide(spark, n_fields: int, rows: int) -> dict:
    """One wide point, BOTH arms, cold single-shot each (re-collecting
    one DataFrame re-uses AQE's materialized stages and reads ~0s —
    the bogus-timing trap this probe exists to avoid)."""
    import time as _t

    from pyspark.sql import functions as F

    from goodtables_pandas_py_spark.schema import TableSchema
    from goodtables_pandas_py_spark.sources import stringly
    from goodtables_pandas_py_spark.validate import _compile_table

    path = build_wide(spark, n_fields, rows)
    sch = TableSchema.from_descriptor({"fields": wide_descriptor(n_fields)})
    entry: dict = {"n_fields": n_fields, "rows": rows}
    for arm in ("typed", "lexical"):
        df = spark.read.parquet(path)
        if arm == "lexical":
            df = stringly(df)
        wide, checks, _ = _compile_table(df, sch, False)
        assert_one_scan(wide, checks)
        aggs = [
            F.count_if(F.col(c.mask_col)).alias(f"c{i}")
            for i, c in enumerate(checks)
        ]
        job = wide.agg(*aggs)
        t0 = _t.time()
        row = job.collect()[0]
        entry[arm] = round(_t.time() - t0, 2)
        entry[f"{arm}_errors"] = sum(x or 0 for x in row)
        entry[f"{arm}_codegen"] = codegen_spans(job)
    entry["n_checks"] = len(checks)
    return entry


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, nargs="+", default=[10, 20, 40])
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--wide", type=int, default=0,
        help="run the WIDE-schema probe at this many fields instead "
        "of the tall replica curve",
    )
    ap.add_argument("--wide-rows", type=int, default=2_000_000)
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

    spark = gt.get_spark(app_name="gt-validate-curve", quiet_logs=True)
    if args.wide:
        entry = run_wide(spark, args.wide, args.wide_rows)
        entry["loadavg"] = os.getloadavg()[0]
        print(json.dumps({"metric": "validate_wide", "unit": "sec", **entry}))
        spark.stop()
        return
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
