#!/usr/bin/env python
"""Skewed-key probes (r8, VERDICT r7 item 5): the FK multi-probe and
the LSH banding are DESIGNED for hot keys — this tool measures them
under deliberate skew instead of trusting the design.

Three probes, one JSON line out:

1. ``fk``: multi-FK check where 50% of child rows carry ONE parent
   key, vs a uniform control of the same size. The design claim:
   ``foreign_key_violations_multi`` distinct()s the child first, so
   the hot key collapses during the partial (map-side) aggregate and
   the join sees unique keys — hot ≈ uniform. A big ratio here means
   the distinct-before-join shape regressed.
2. ``lsh``: minhash near-dup pairs where 50% of the corpus is ONE
   document (one white-hot LSH bucket in every band), vs a uniform
   near-dup corpus of the same size. The design claim: the
   ``max_bucket`` cap (cap_buckets: count-first, filter-before-
   collect) bounds the hot bucket's pair explosion to cap² per band,
   so hot stays within a small factor of uniform instead of the
   uncapped 40k² ≈ 1.6e9 pairs.
3. ``aqe``: a raw shuffled equi-join (no broadcast, no distinct —
   the shape the engine's binned temporal joins and over-threshold
   LSH candidate joins take) with a 50%-hot key and incompressible
   payloads; asserts ``skew=true`` in the executed plan — AQE's
   skew-split is live and engages when a genuinely skewed exchange
   reaches a join. Thresholds are scaled to probe size; at 100 TB
   the 256 MB defaults play the identical role.

Usage: python tools/skew_probe.py [--child-rows 8000000] [--docs 80000]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child-rows", type=int, default=8_000_000)
    ap.add_argument("--docs", type=int, default=80_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import goodtables_pandas_py_spark as gt
    from goodtables_pandas_py_spark.checks.keys import (
        foreign_key_violations_multi,
    )
    from goodtables_pandas_py_spark.extensions import dedup as xdedup

    spark = gt.get_spark(app_name="gt-skew-probe", quiet_logs=True)
    timings: dict[str, float] = {}
    sizes: dict[str, int] = {}

    # ---------------- probe 1: multi-FK under a 50%-hot child key
    n = args.child_rows
    n_parent = 500_000
    parent_a = spark.range(n_parent).select(F.col("id").alias("pk"))
    parent_b = spark.range(n_parent - 1000).select(F.col("id").alias("pk"))

    def fk_time(child) -> tuple[float, int]:
        t0 = time.time()
        cnt = foreign_key_violations_multi(
            child,
            ["fk"],
            {
                "fk_a": (parent_a, ["pk"]),
                "fk_b": (parent_b, ["pk"]),
            },
            label_col="violated",
        ).count()
        return round(time.time() - t0, 2), cnt

    hot_child = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_parent + 1000)))
        .alias("fk")
    )
    uni_child = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(n_parent + 1000)).alias("fk")
    )
    # warm once at small size so neither arm pays one-time codegen
    fk_time(uni_child.limit(10_000))
    timings["fk_uniform"], sizes["fk_uniform_viol"] = fk_time(uni_child)
    timings["fk_hot"], sizes["fk_hot_viol"] = fk_time(hot_child)
    ratio = timings["fk_hot"] / max(timings["fk_uniform"], 1e-9)
    timings["fk_hot_over_uniform"] = round(ratio, 2)
    if ratio > 3:
        print(
            f"WARN fk hot/uniform ratio {ratio:.2f} > 3 — the "
            "distinct-before-join collapse is not absorbing the hot key",
            file=sys.stderr,
        )

    # ---------------- probe 2: minhash LSH under a 50%-hot bucket
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = max(1, args.docs // 2 // 5000)
    base = (
        d.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" u"), F.col("rep")).alias(
                "text"
            ),
        )
        .limit(args.docs // 2)
    )
    one = d.limit(1).select("text").first()["text"]
    hot_block = spark.range(args.docs // 2).select(
        (F.col("id") + 500_000_000).alias("doc_id"),
        F.lit(one).alias("text"),
    )
    hot_corpus = base.unionByName(hot_block).repartition(32)
    uni_corpus = (
        d.crossJoin(
            spark.range(2 * reps).select(F.col("id").alias("rep"))
        )
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" u"), F.col("rep")).alias(
                "text"
            ),
        )
        .limit(args.docs)
        .repartition(32)
    )

    def lsh_time(corpus) -> tuple[float, int]:
        t0 = time.time()
        cnt = xdedup.minhash_dedup_pairs(corpus, threshold=0.5).count()
        return round(time.time() - t0, 2), cnt

    lsh_time(uni_corpus.limit(2_000))  # warm
    timings["lsh_uniform"], sizes["lsh_uniform_pairs"] = lsh_time(
        uni_corpus
    )
    timings["lsh_hot"], sizes["lsh_hot_pairs"] = lsh_time(hot_corpus)
    ratio = timings["lsh_hot"] / max(timings["lsh_uniform"], 1e-9)
    timings["lsh_hot_over_uniform"] = round(ratio, 2)
    if ratio > 3:
        print(
            f"WARN lsh hot/uniform ratio {ratio:.2f} > 3 — the "
            "max_bucket cap is not bounding the hot bucket",
            file=sys.stderr,
        )

    # ---------------- probe 3: AQE skew-split engages on a raw
    # shuffled join (the backstop for shapes with no distinct/cap)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(n // 2).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(n // 20).select(
            F.col("id").alias("k"), F.lit("d").alias("dim")
        )
        q = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.min("payload").alias("p")
        )
        t0 = time.time()
        sizes["aqe_join_rows"] = int(q.collect()[0]["n"])
        timings["aqe_skew_join"] = round(time.time() - t0, 2)
        plan = q._jdf.queryExecution().executedPlan().toString()
        sizes["aqe_skew_engaged"] = int(
            "skew=true" in plan or "skewed" in plan.lower()
        )
        if not sizes["aqe_skew_engaged"]:
            print(
                "WARN aqe skew-split did NOT engage on the hot join",
                file=sys.stderr,
            )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    print(
        json.dumps(
            {
                "metric": "skew_probe_total",
                "value": round(sum(
                    v for k, v in timings.items()
                    if not k.endswith("_over_uniform")
                ), 2),
                "unit": "sec",
                "timings": timings,
                "sizes": sizes,
                "child_rows": args.child_rows,
                "docs": args.docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
