#!/usr/bin/env python
"""ANN index lifecycle example, runnable against the bundled testdata:

    python examples/ann_index_lifecycle.py [sf_dir] [root_dir]

The maintenance story a 100 TB embedding store runs continuously
(every step here is the bounded-cost shape, never a corpus rewrite
unless the operator says so up front):

1. BUILD + PUBLISH: train an IVF index and publish it under a
   versioned root (`write_ivf_index_version`) — the release sink's
   claim + pointer-swap machinery, so serving only ever resolves a
   complete index and racing publishers lose loudly.
2. SERVE: per-query (`ivf_index_topk`, partition-pruned scan), and
   the unbounded distributed batch path
   (`ivf_index_topk_batch_distributed` — no driver collect).
3. INGEST: `append_to_ivf_index` assigns new vectors to the STORED
   centroids — zero training jobs, parquet append. The cost of that
   speed is drift: appended data concentrates, lists balloon, and
   recall at fixed nprobe decays.
4. MONITOR: `ivf_recall_probe` measures recall@k against the index's
   own exact answer on a query sample — the number that tells you
   WHEN to spend on maintenance, instead of rebuilding on a timer.
5. REPAIR, cheap path first: `split_ivf_hot_lists` re-fits ONLY the
   ballooned lists (untouched partitions carry forward
   file-identical — cost ∝ hot rows). When drift is global,
   `recluster_ivf_index_version` retrains and reassigns everything
   as ONE new version under the root; readers mid-scan keep their
   snapshot, and the pointer flips atomically.

The appended batch here is deliberately adversarial: a tight cluster
STRADDLING two existing centroids, the worst case for frozen
assignment.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import goodtables_pandas_py_spark as gt
from goodtables_pandas_py_spark.extensions import vecindex as xvi

from pyspark.sql import functions as F


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.mkdtemp(prefix="gt_ann_"), "index_root")
    )
    spark = gt.get_spark(app_name="ann-index-lifecycle")

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dim = len(emb.first()["embedding"])

    # 1. build + publish v1 under the versioned root
    man = xvi.write_ivf_index_version(emb, root, nlist=8)
    print(
        f"published {man['version']}: {man['n_vectors']} vectors, "
        f"nlist={man['nlist']}"
    )

    # 2. serve: per-query and the distributed batch path
    idx = xvi.read_ivf_index_current(spark, root)
    qv = [float(x) for x in emb.first()["embedding"]]
    top = xvi.ivf_index_topk(idx, qv, k=5, nprobe=2).collect()
    print(f"per-query serve: top hit id={top[0]['id']} "
          f"cosine={top[0]['cosine']:.4f}")
    queries = emb.limit(200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = xvi.ivf_index_topk_batch_distributed(
        idx, queries, k=5, nprobe=2
    ).count()
    print(f"distributed batch serve: {n} result rows for 200 queries")

    # 3. ingest an adversarial batch: a tight cluster straddling the
    # midpoint of the two most-populated lists — frozen assignment
    # splits it across both and neither list's centroid describes it
    sizes = sorted(
        ((int(v), int(k)) for k, v in man["list_sizes"].items()),
        reverse=True,
    )
    c_a = idx.centroids[sizes[0][1]]
    c_b = idx.centroids[sizes[1][1]]
    mid = [(a + b) / 2.0 for a, b in zip(c_a, c_b)]
    base = emb.count()
    straddle = spark.range(base, base + base // 2).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.lit(float(mid[d]))
                + (F.rand(seed=d) - F.lit(0.5)) * F.lit(0.05)
                for d in range(dim)
            ]
        ).alias("embedding"),
    )
    vdir = f"{root}/versions/{man['version']}"
    man2 = xvi.append_to_ivf_index(straddle, vdir)
    print(
        f"appended {base // 2} straddling vectors -> "
        f"{man2['n_vectors']} total (centroids FROZEN)"
    )

    # 4. monitor: measured recall@10 at a small nprobe — the drift
    # signal (the straddle cluster's neighbors now live in two lists)
    idx = xvi.read_ivf_index_current(spark, root)
    probe_q = straddle.limit(50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    recall_before = xvi.ivf_recall_probe(idx, probe_q, k=10, nprobe=1)
    print(f"recall@10 (nprobe=1) after drift: {recall_before:.3f}")

    # 5a. cheap repair: split the ballooned lists only
    sizes_now = {
        int(k): int(v)
        for k, v in idx.manifest["list_sizes"].items()
    }
    mean = sum(sizes_now.values()) / len(sizes_now)
    split_dir = os.path.join(
        tempfile.mkdtemp(prefix="gt_ann_split_"), "idx"
    )
    sman = xvi.split_ivf_hot_lists(
        spark,
        vdir,
        split_dir,
        hot_factor=0.999 * max(sizes_now.values()) / mean,
    )
    print(
        f"split {len(sman['split']['split_lists'])} hot list(s) -> "
        f"nlist {sman['split']['nlist_before']}->{sman['nlist']}, "
        f"{sman['split']['reused_lists']} lists reused file-identical"
    )

    # 5b. global repair: recluster AS A NEW VERSION under the root —
    # serving flips atomically, v1 stays readable for laggards. Keep
    # the SAME nlist so the fixed-nprobe recall comparison is
    # apples-to-apples (widening the index while holding nprobe cuts
    # per-probe coverage — scale nprobe with nlist when you widen)
    rman = xvi.recluster_ivf_index_version(spark, root)
    idx2 = xvi.read_ivf_index_current(spark, root)
    recall_after = xvi.ivf_recall_probe(idx2, probe_q, k=10, nprobe=1)
    print(
        f"reclustered as {rman['version']} (same nlist): "
        f"recall@10 (nprobe=1) {recall_before:.3f} -> {recall_after:.3f}"
    )
    if not recall_after >= recall_before:
        print("recall did not improve — investigate before promoting")
        return 1
    print(f"index root at {root}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
