"""IVF maintenance cost at production width (r11, VERDICT r10 item 3):
recluster and split were probed only on the nlist=20 index — this
measures them on the 20x corpus at nlist=1024 (the corrected 120k-group
workload of BASELINE.md §nlist-saturation-correction), with the cost
decomposition the verdict asked for:

- ``recluster``: fit (train_cap-bounded Lloyd at k=1024 — train_cap
  bounds ROWS, not centroids, so the fit is the open question at
  width), reassign+write (one map-only Arrow-matmul pass + the
  shuffle-free partitionBy). The fit is timed separately by running
  the same ``_centroid_rows`` call the operator makes; the full
  operator run then prices fit+reassign+write together, so
  reassign+write ≈ total − fit.
- ``split``: a MULTI-hot-list split (the r10 probe touched exactly 1
  list) — hot_factor is derived from the manifest so the top
  ``--hot-lists`` lists qualify; cost must track the touched rows,
  with every other partition carried file-identical.
- ``delete``: 100 ids from ONE list at width — the pruning case: 1
  of 1024 partitions rewrites; and ~1%% spread over every list — the
  upper bound.
- ``merge``: the top list gutted to a runt by a delete, then folded
  into its neighbor — cost ∝ the cold rows, survivors hardlink.

Reuses nlist_saturation's work dir (the 20x embeddings table and the
ivf_sat_1024 index are rebuilt only when absent). Prints one JSON
line.

    python tools/maintenance_at_width.py
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
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--docs-reps", type=int, default=20)
    ap.add_argument("--hot-lists", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import goodtables_pandas_py_spark as gt
    from goodtables_pandas_py_spark.extensions import vecindex as xvi
    from goodtables_pandas_py_spark.extensions.similarity import (
        _centroid_rows,
    )

    spark = gt.get_spark(
        app_name="maintenance-at-width", quiet_logs=True
    )
    out: dict = {
        "metric": "ivf_maintenance_at_width",
        "nlist": args.nlist,
        "sf_dir": SF_DIR,
        "loadavg_start": os.getloadavg()[0],
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
    out["vectors"] = be.count()

    idx_dir = f"{WORK}/ivf_sat_{args.nlist}"
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        t0 = time.time()
        xvi.write_ivf_index(be, idx_dir, nlist=args.nlist, refine=1)
        out["build_s"] = round(time.time() - t0, 2)
    idx = xvi.read_ivf_index(spark, idx_dir)
    man = idx.manifest
    out["nonempty_lists"] = len(man["list_sizes"])

    # --- recluster at width, fit cost isolated -----------------------
    # the operator's own fit call, run standalone first (same sample
    # cap, same refine) so the k=1024 Lloyd price is visible
    t0 = time.time()
    cents = _centroid_rows(
        idx.postings.select(F.col("vec").alias("__v")),
        "__v",
        args.nlist,
        1,
        131_072,
    )
    out["recluster_fit_s"] = round(time.time() - t0, 2)
    out["fit_centroids"] = len(cents)
    t0 = time.time()
    rman = xvi.recluster_ivf_index(
        spark, idx_dir, f"{WORK}/ivf_recluster_{args.nlist}",
        refine=1, train_cap=131_072,
    )
    out["recluster_total_s"] = round(time.time() - t0, 2)
    out["recluster_reassign_write_s"] = round(
        out["recluster_total_s"] - out["recluster_fit_s"], 2
    )
    assert rman["n_vectors"] == man["n_vectors"]

    # --- multi-hot-list split at width -------------------------------
    sizes = sorted(
        (int(v) for v in man["list_sizes"].values()), reverse=True
    )
    mean = man["n_vectors"] / max(int(man["nlist"]), 1)
    k_hot = min(args.hot_lists, len(sizes))
    hot_factor = 0.999 * sizes[k_hot - 1] / mean
    t0 = time.time()
    sman = xvi.split_ivf_hot_lists(
        spark, idx_dir, f"{WORK}/ivf_split_{args.nlist}",
        hot_factor=hot_factor,
    )
    out["split_s"] = round(time.time() - t0, 2)
    out["split_lists"] = len(sman["split"]["split_lists"])
    out["split_rows_touched"] = sum(
        int(man["list_sizes"][c]) for c in sman["split"]["split_lists"]
    )
    out["split_reused_lists"] = sman["split"]["reused_lists"]

    # --- delete at width: pruned vs spread ---------------------------
    top_cid = max(man["list_sizes"], key=lambda k: man["list_sizes"][k])
    one_ids = [
        r["id"]
        for r in idx.postings.where(F.col("ivf_cid") == int(top_cid))
        .select("id")
        .orderBy("id")
        .limit(100)
        .collect()
    ]
    t0 = time.time()
    d1 = xvi.delete_from_ivf_index(
        spark, idx_dir, f"{WORK}/ivf_del1_{args.nlist}", one_ids
    )
    out["delete_100ids_one_list_s"] = round(time.time() - t0, 2)
    out["delete_one_touched"] = len(d1["deleted"]["touched_lists"])
    spread = be.where(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("id")
    )
    t0 = time.time()
    dall = xvi.delete_from_ivf_index(
        spark, idx_dir, f"{WORK}/ivf_delall_{args.nlist}", spread
    )
    out["delete_1pct_spread_s"] = round(time.time() - t0, 2)
    out["delete_spread_touched"] = len(dall["deleted"]["touched_lists"])

    # --- merge at width: gut the top list, fold it away --------------
    keep = set(one_ids[:50])
    gut = (
        idx.postings.where(F.col("ivf_cid") == int(top_cid))
        .select("id")
        .where(~F.col("id").isin(list(keep)))
    )
    xvi.delete_from_ivf_index(
        spark, idx_dir, f"{WORK}/ivf_gut_{args.nlist}", gut
    )
    t0 = time.time()
    mman = xvi.merge_ivf_cold_lists(
        spark,
        f"{WORK}/ivf_gut_{args.nlist}",
        f"{WORK}/ivf_merged_{args.nlist}",
        cold_factor=0.25,
    )
    out["merge_s"] = round(time.time() - t0, 2)
    out["merge_lists"] = len(mman["merged"]["merged_lists"])

    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
