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
4. MONITOR→DECIDE: `ivf_maintenance_plan` measures recall@k against
   the index's own exact answer on a query sample and returns the
   repair action WITH its evidence (measured recall, hot/cold list
   tables) — the scheduler dispatches on it instead of rebuilding on
   a timer.
5. REPAIR, cheap path first: `split_ivf_hot_lists` re-fits ONLY the
   ballooned lists (untouched partitions carry forward
   file-identical — cost ∝ hot rows). When drift is global,
   `recluster_ivf_index_version` retrains and reassigns everything
   as ONE new version under the root; readers mid-scan keep their
   snapshot, and the pointer flips atomically.
5b. REFRESH: `upsert_into_ivf_index_version` applies a re-embedding
   wave as ONE pointer swap — replaced ids move lists, unchanged
   payloads stay put, replayed batches publish nothing.
6. TAKEDOWN: `delete_from_ivf_index_version` removes ids by
   rewriting only the lists that hold them; replays are no-ops.
7. COMPACT: when deletes leave runt lists, the plan says `merge` and
   `merge_ivf_cold_lists` folds them into their nearest surviving
   neighbor (renumbered dense, survivors hardlink forward).

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

    # 4. monitor: ivf_maintenance_plan measures recall@10 at the
    # working nprobe and DECIDES (r11) — the scheduler runs this, not
    # prose. The plan carries the evidence: measured recall, the
    # hot/cold list tables, and the reason.
    probe_q = straddle.limit(50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = xvi.ivf_maintenance_plan(
        spark, root, probe_q, recall_floor=0.9, nprobe=1
    )
    recall_before = plan["recall_at_k"]
    print(
        f"maintenance plan: action={plan['action']} — {plan['reason']}"
    )

    # 5. repair: dispatch on the plan. split is the cheap local fix
    # (cost ∝ hot rows, untouched partitions carry file-identical);
    # recluster is the global one, published AS A NEW VERSION under
    # the root so serving flips atomically and v1 stays readable.
    if plan["action"] == "split":
        split_dir = os.path.join(
            tempfile.mkdtemp(prefix="gt_ann_split_"), "idx"
        )
        sman = xvi.split_ivf_hot_lists(
            spark, vdir, split_dir, hot_factor=plan["hot_factor"]
        )
        print(
            f"split {len(sman['split']['split_lists'])} hot list(s) "
            f"-> nlist {sman['split']['nlist_before']}->"
            f"{sman['nlist']}, {sman['split']['reused_lists']} lists "
            "reused file-identical"
        )
    if plan["action"] == "recluster" or plan.get(
        "escalate_to_recluster"
    ):
        # keep the SAME nlist so the fixed-nprobe recall comparison
        # is apples-to-apples (widening the index while holding
        # nprobe cuts per-probe coverage — scale nprobe with nlist
        # when you widen)
        rman = xvi.recluster_ivf_index_version(spark, root)
        idx2 = xvi.read_ivf_index_current(spark, root)
        recall_after = xvi.ivf_recall_probe(
            idx2, probe_q, k=10, nprobe=1
        )
        print(
            f"reclustered as {rman['version']} (same nlist): "
            f"recall@10 (nprobe=1) {recall_before:.3f} -> "
            f"{recall_after:.3f}"
        )
        if not recall_after >= recall_before:
            print("recall did not improve — investigate before promoting")
            return 1

    # 5b. refresh: a model upgrade re-embeds part of the corpus —
    # upsert_into_ivf_index_version replaces those ids in ONE pointer
    # swap (no delete+append window where they vanish from serving);
    # only the lists holding changed ids rewrite, and replaying the
    # same batch publishes nothing
    refreshed = emb.orderBy("vec_id").limit(5).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    uman = xvi.upsert_into_ivf_index_version(spark, root, refreshed)
    print(
        f"refresh: {uman['upserted']['n_replaced']} ids re-embedded "
        f"as {uman['version']} ({uman['upserted']['n_moved']} moved "
        f"lists, {uman['upserted']['reused_lists']} carried "
        f"file-identical)"
    )
    ureplay = xvi.upsert_into_ivf_index_version(spark, root, refreshed)
    print(
        f"replayed refresh: n_changed="
        f"{ureplay['upserted']['n_changed']} (no new version)"
    )

    # 6. takedown: delete ids as a NEW version (partition-pruned —
    # only the lists holding them rewrite); a replayed takedown is a
    # no-op, not a duplicate version
    victims = [r["vec_id"] for r in emb.limit(3).collect()]
    dman = xvi.delete_from_ivf_index_version(spark, root, victims)
    print(
        f"takedown: deleted {dman['deleted']['n_deleted']} ids as "
        f"{dman['version']} (touched "
        f"{len(dman['deleted']['touched_lists'])} list(s), "
        f"{dman['deleted']['reused_lists']} carried file-identical)"
    )
    replay = xvi.delete_from_ivf_index_version(spark, root, victims)
    print(
        f"replayed takedown: n_deleted={replay['deleted']['n_deleted']}"
        f" (no new version published)"
    )

    # 7. compaction: if deletes left runt lists, the plan says merge
    # and merge_ivf_cold_lists folds them into their nearest
    # neighbor (survivor partitions hardlink forward under renumbered
    # cids — cost ∝ the cold rows only)
    plan2 = xvi.ivf_maintenance_plan(
        spark, root, probe_q, recall_floor=0.9, nprobe=1
    )
    print(
        f"post-takedown plan: action={plan2['action']} — "
        f"{plan2['reason']}"
    )
    if plan2["action"] == "merge":
        cur = xvi.read_ivf_index_current(spark, root)
        merge_dir = os.path.join(
            tempfile.mkdtemp(prefix="gt_ann_merge_"), "idx"
        )
        mman = xvi.merge_ivf_cold_lists(
            spark,
            os.path.join(
                root, "versions", cur.manifest["version"]
            ),
            merge_dir,
            cold_factor=plan2["cold_factor"],
        )
        print(
            f"merged {len(mman['merged']['merged_lists'])} cold "
            f"list(s) -> nlist {mman['merged']['nlist_before']}->"
            f"{mman['nlist']}"
        )
    print(f"index root at {root}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
