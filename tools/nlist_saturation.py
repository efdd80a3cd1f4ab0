"""nlist saturation probe (r10, VERDICT r9 item 2): validate the
"at production nlist the cogroup saturates the cluster" claim with
measurements instead of extrapolation from nlist=20.

Builds the 20x replicated embedding table (scale_probe's shape),
builds IVF indexes at several nlist widths, and times the 120k-query
distributed serve (`ivf_index_topk_batch_distributed`) two ways per
width:

- ``nprobe=4`` (fixed probes): constant probe-row volume, candidate
  volume SHRINKS with nlist (4/nlist of the corpus) — the
  overhead-dominated regime that exposes per-task scheduling cost.
- ``nprobe ~ nlist/5`` (constant corpus fraction = the nlist=20
  baseline's 4/20): candidate volume held at ~1e9 scores, so wall
  time differences reflect task shape and parallelism, not less work.
  This is the honest apples-to-apples saturation curve — note the
  probe-row count (queries x nprobe, each carrying a qvec copy)
  grows with nprobe; its shuffle cost is part of the real price of a
  wide index at constant recall fraction.

Run the whole script a second time under OPENBLAS_NUM_THREADS=1 to
revisit the r9 BLAS-thread decision at saturation (the env must be
set before the JVM forks Python workers, i.e. on the driver process):

    python tools/nlist_saturation.py --nlists 1024
    OPENBLAS_NUM_THREADS=1 python tools/nlist_saturation.py --nlists 1024

Prints one JSON line. Reuses scale_probe's WORK dir when the 20x
embeddings table is already there.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/scale_probe")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlists", default="20,256,1024")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--docs-reps", type=int, default=20)
    args = ap.parse_args()
    nlists = [int(x) for x in args.nlists.split(",")]

    from pyspark.sql import functions as F

    import goodtables_pandas_py_spark as gt
    from goodtables_pandas_py_spark.extensions import vecindex as xvi

    spark = gt.get_spark(app_name="nlist-saturation", quiet_logs=True)
    out: dict = {
        "metric": "nlist_saturation",
        "sf_dir": SF_DIR,
        "blas_cap": os.environ.get("OPENBLAS_NUM_THREADS"),
        "loadavg_start": os.getloadavg()[0],
        "points": [],
    }

    epath = f"{WORK}/embeddings.parquet"
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_expected = e.count() * args.docs_reps
    try:
        have = spark.read.parquet(epath).count()
    except Exception:
        have = -1
    if have != n_expected:
        reps = spark.range(args.docs_reps).select(F.col("id").alias("rep"))
        big_e = e.crossJoin(reps).select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x * (1.0 + F.col("rep") / 1000.0),
            ).alias("embedding"),
        )
        big_e.repartition(32).write.mode("overwrite").parquet(epath)
    be = spark.read.parquet(epath)
    n_base = be.count()
    out["vectors"] = n_base

    qreps = (100_000 + n_base - 1) // n_base
    big_q = be.crossJoin(
        spark.range(qreps).select(F.col("id").alias("qr"))
    ).select(
        # stride must clear the REPLICATED id range (docs_reps tiers
        # of 1M each), or query_ids collide across qr tiers and the
        # rank window merges different query vectors into one group
        # (r10 review fix; the pre-fix runs served ~80k distinct
        # groups instead of 120k — workload shape noted in
        # BASELINE.md, before/after comparison unaffected since both
        # sides served the identical workload)
        (F.col("vec_id") + F.col("qr") * 100_000_000).alias("query_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * (1.0 + F.col("qr") / 500.0),
        ).alias("embedding"),
    )
    n_queries = n_base * qreps
    out["queries"] = n_queries

    for nlist in nlists:
        point: dict = {"nlist": nlist}
        idx_dir = f"{WORK}/ivf_sat_{nlist}"
        t0 = time.time()
        m = xvi.write_ivf_index(be, idx_dir, nlist=nlist, refine=1)
        point["build_s"] = round(time.time() - t0, 2)
        point["nonempty_lists"] = len(m["list_sizes"])
        idx = xvi.read_ivf_index(spark, idx_dir)
        # constant-fraction nprobe: ~the nlist=20 baseline's 4/20
        frac_probe = max(1, round(nlist / 5))
        for label, nprobe in (("fixed4", 4), ("frac", frac_probe)):
            times = []
            for _ in range(args.reps):
                la0 = os.getloadavg()[0]
                t0 = time.time()
                nrows = xvi.ivf_index_topk_batch_distributed(
                    idx, big_q, k=10, nprobe=nprobe
                ).count()
                times.append(round(time.time() - t0, 2))
                point.setdefault(f"{label}_loadavg", []).append(
                    round(la0, 1)
                )
            # candidates ~= queries x sum(sizes of probed lists)/nlist
            point[f"{label}_nprobe"] = nprobe
            point[f"{label}_serve_s"] = times
            point[f"{label}_rows"] = nrows
            point[f"{label}_est_candidates"] = int(
                n_queries * nprobe / max(nlist, 1) * n_base
            )
        out["points"].append(point)
        print(json.dumps({"progress": point}), flush=True)

    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
