#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Methodology: steady-state throughput. Each query runs 3×; the
reported time is the MEDIAN, and the first (cold) run is reported
separately under "cold_queries". Rationale: the one-time costs the
cold run pays — parquet footer/file-listing for the SF, Python-RDD
serializer setup, residual JIT of the codegen'd classes — are per-JOB
costs that amortize to zero over a 100 TB run, while the median
measures the per-byte cost that actually scales. Whole-plan-shape
codegen is additionally pre-compiled by an untimed warm-up pass at
sf0.001 (same plans, tiny data). Both numbers are printed; nothing is
hidden.

Headline set = the engine's core workloads (SURVEY.md §6):
- full-package validation (parse-from-string + constraints + keys +
  FK) over orders+lineitem — the reference's whole raison d'être;
- TPC-H-Q1-shaped pricing aggregate (single-scan fused agg);
- FK anti-join (broadcast parent);
- MinHash near-dup candidate pipeline over documents;
- brute-force cosine top-k over embeddings;
- tumbling-window event aggregation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def bench_validate(spark, sf_dir):
    import goodtables_pandas_py_spark as gt

    descriptor = {
        "name": "bench",
        "resources": [
            {
                "name": "orders",
                "path": f"{sf_dir}/orders.parquet",
                "format": "parquet",
                "schema": {
                    "fields": [
                        {"name": "o_orderkey", "type": "integer",
                         "constraints": {"required": True}},
                        {"name": "o_custkey", "type": "integer"},
                        {"name": "o_orderstatus", "type": "string",
                         "constraints": {"enum": ["F", "P", "O"]}},
                        {"name": "o_totalprice", "type": "number",
                         "constraints": {"minimum": 0}},
                        {"name": "o_orderdate", "type": "datetime"},
                        {"name": "o_orderpriority", "type": "string",
                         "constraints": {"pattern": "[1-5]-[A-Z ]+"}},
                    ],
                    "primaryKey": ["o_orderkey"],
                },
            },
            {
                "name": "lineitem",
                "path": f"{sf_dir}/lineitem.parquet",
                "format": "parquet",
                "schema": {
                    "fields": [
                        {"name": "l_orderkey", "type": "integer",
                         "constraints": {"required": True}},
                        {"name": "l_partkey", "type": "integer"},
                        {"name": "l_suppkey", "type": "integer"},
                        {"name": "l_linenumber", "type": "integer"},
                        {"name": "l_quantity", "type": "number",
                         "constraints": {"minimum": 0, "maximum": 50}},
                        {"name": "l_extendedprice", "type": "number"},
                        {"name": "l_discount", "type": "number",
                         "constraints": {"minimum": 0, "maximum": 0.1}},
                        {"name": "l_tax", "type": "number"},
                        {"name": "l_returnflag", "type": "string",
                         "constraints": {"enum": ["N", "A", "R"]}},
                        {"name": "l_linestatus", "type": "string",
                         "constraints": {"enum": ["O", "F"]}},
                        {"name": "l_shipdate", "type": "datetime"},
                    ],
                    "primaryKey": ["l_orderkey", "l_linenumber"],
                    "foreignKeys": [
                        {"fields": ["l_orderkey"],
                         "reference": {"resource": "orders",
                                       "fields": ["o_orderkey"]}}
                    ],
                },
            },
        ],
    }
    report = gt.validate(spark, descriptor)
    return report["error-count"]


def main() -> None:
    import goodtables_pandas_py_spark as gt
    from goodtables_pandas_py_spark.queries import QUERIES

    spark = gt.get_spark(app_name="gt-bench")
    sf_dir = SF_DIR

    # warm-up (not timed): run every headline pipeline once at the
    # smallest SF so JIT/codegen compilation is excluded from the
    # steady-state numbers (whole-stage codegen compiles per plan
    # shape; first execution pays javac/JIT cost once per JVM)
    warm = "/root/testdata/sf0.001"
    bench_validate(spark, warm)
    QUERIES["a1_pricing_summary"](spark, warm).collect()
    QUERIES["k3_fk_violations"](spark, warm).count()
    QUERIES["x2_minhash_pairs"](spark, warm).count()
    QUERIES["x3_cosine_topk"](spark, warm).collect()
    QUERIES["x5_events_window"](spark, warm).count()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}

    def run(name, fn, reps=3):
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        cold[name] = round(samples[0], 3)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)

    run("validate_package", lambda: bench_validate(spark, sf_dir))
    run("q1_pricing", lambda: QUERIES["a1_pricing_summary"](spark, sf_dir).collect())
    run("fk_anti_join", lambda: QUERIES["k3_fk_violations"](spark, sf_dir).count())
    run("minhash_dedup", lambda: QUERIES["x2_minhash_pairs"](spark, sf_dir).count())
    run("cosine_topk", lambda: QUERIES["x3_cosine_topk"](spark, sf_dir).collect())
    run("events_window", lambda: QUERIES["x5_events_window"](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 3),
                "reps": 3,
                "stat": "median",
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
