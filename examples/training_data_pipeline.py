#!/usr/bin/env python
"""End-to-end training-data pipeline example, runnable against the
bundled testdata:

    python examples/training_data_pipeline.py [sf_dir] [out_dir]

Stages (each a lazy Spark plan until the final writes):
1. VALIDATE the raw tables against a Frictionless descriptor
   (single-scan parse + constraints + keys; errors to a report).
2. PREPARE the documents corpus: quality filter (C4/Gopher-style
   rules, map-only), MinHash near-dedup (banded LSH + exact verify),
   ExactSubstr span masking (cross-document duplicated token runs
   cut from every occurrence), and eval-holdout decontamination (a
   deterministic hash_sample slice becomes the eval set; training
   docs overlapping it by n-grams are dropped) via the one-call
   prepare_corpus API.
3. INDEX the kept corpus for incremental ingestion: persist the
   banded LSH signatures — later batches dedup against this index
   without rescanning the corpus (see streaming/dedup.py).
4. WRITE the audit trail hive-partitioned by keep flag so "what did
   each rule cost us" is a pruned read, not a recompute.
5. MIX the domains to target proportions (mixture_sample — the
   per-source sampling-weights step of corpus assembly, deterministic
   hash keep/drop), DSIR-select toward a reference distribution
   (hashed-n-gram importance weights, deterministic Gumbel-top-k),
   LABEL with CCNet-style quality quartiles (self-trained unigram
   cross-entropy → one-sketch-pass quality_bins, r6), fit a BPE
   merge list and count tokens under the LEARNED vocab (r6 — budgets
   are tokenizer tokens, not whitespace words), then SPLIT
   deterministically into train/val/test (salted-md5 hash split —
   reproducible across engines and cluster sizes) and pack each
   source's documents into fixed-length training sequences by their
   BPE counts, written partitioned by split.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import goodtables_pandas_py_spark as gt
from goodtables_pandas_py_spark.extensions.dedup import banded_signatures
from goodtables_pandas_py_spark.extensions.pipeline import prepare_corpus
from goodtables_pandas_py_spark.sources import write_partitioned


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gt_pipeline_out"
    spark = gt.get_spark("training-data-pipeline")

    # 1. validate the relational side
    descriptor = {
        "name": "pipeline-input",
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
            }
        ],
    }
    report = gt.validate(spark, descriptor)
    print(
        f"validate: valid={report['valid']} "
        f"errors={report['error-count']}"
    )

    # 2. quality-filter + near-dedup + eval decontamination in one
    # call: a deterministic 2% slice is carved out as the held-out
    # eval set, and every training document whose 3-gram overlap
    # covers an eval doc is dropped (the holdout-decontamination
    # workflow — eval docs and their near-matches never reach train)
    from goodtables_pandas_py_spark.extensions.splits import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    evals = hash_sample(docs, 0.02, salt="eval-holdout").select(
        "doc_id", "text"
    )
    prep = prepare_corpus(
        docs,
        dedup_threshold=0.5,
        # ExactSubstr stage: token runs >= 20 still duplicated across
        # the deduped survivors (boilerplate fragments, quotes) are
        # cut from every occurrence (Lee et al., arXiv:2107.06499)
        span_dedup_k=20,
        eval_sets=evals,
        decontam_ngram=3,
        decontam_ratio=0.8,
        # belt-and-suspenders (r10): the fuzzy pass also drops
        # paraphrased/lightly-edited eval copies exact n-grams miss
        # (LSH candidates vs broadcast eval bands + exact-Jaccard
        # verify — near_contaminated_ids)
        fuzzy_decontam_threshold=0.5,
        # domain balancing: at most 400 docs per source, longest
        # first (deterministic via doc_id tiebreak)
        cap_per_group=400,
        cap_group_cols=["source"],
        cap_order_col="n_chars",
        audit=True,
        min_tokens=5,
    )
    evals.write.mode("overwrite").parquet(f"{out}/eval_holdout.parquet")
    print(
        f"corpus: {prep.n_input} in → {prep.n_after_quality} after "
        f"quality → {prep.n_after_dedup} after dedup → "
        f"{prep.n_after_cap} after per-source cap → "
        f"{prep.n_after_span_mask} after span masking → "
        f"{prep.n_after_decontam} after eval decontamination "
        f"(exact n-gram + fuzzy Jaccard≥0.5)"
    )
    # 3. persist corpus + LSH index for incremental ingestion.
    # Span masking REBUILT the text, so text-derived metadata is
    # refreshed before anything ships (a 90%-boilerplate doc must not
    # carry its pre-mask n_chars into the release)
    from pyspark.sql import functions as F

    released = prep.kept.withColumn("n_chars", F.length("text"))
    released.write.mode("overwrite").parquet(f"{out}/corpus.parquet")
    # the corpus artifact is on disk: read it BACK (lineage cut — the
    # restart-point pattern docs/TUNING.md preaches) and release the
    # fuzzy scan's internal candidate cache (ADVICE r9 lifecycle);
    # everything downstream now scans parquet, not the prep plan
    from goodtables_pandas_py_spark.cacheutil import unpersist_scan_state

    unpersist_scan_state(prep.kept)
    released = spark.read.parquet(f"{out}/corpus.parquet")
    banded_signatures(released).write.mode("overwrite").parquet(
        f"{out}/corpus_lsh_index.parquet"
    )
    # (at real scale use sources.write_bucketed(..., ["band", "bh"])
    # so incremental lookups join bucket-co-located)

    # 4. audit trail, partitioned for pruned drill-downs
    write_partitioned(
        prep.quality_audit.withColumn(
            "keep_part", prep.quality_audit["keep"].cast("string")
        ),
        f"{out}/quality_audit.parquet",
        ["keep_part"],
    )

    # 5. deterministic train/val/test split + sequence packing: the
    # split is a salted-md5 hex-range compare (map-only; the same doc
    # lands in the same split on any engine or cluster size — pin the
    # salt per dataset release), and sequence_offsets lays each
    # source's documents end-to-end into 2048-token training
    # sequences. grouped_hash_split is the leakage-safe variant when
    # sub-threshold near-dup pairs should never straddle train/eval.
    from goodtables_pandas_py_spark.extensions.splits import (
        hash_split,
        mixture_sample,
        sequence_offsets,
    )
    from goodtables_pandas_py_spark.extensions.text import token_count

    # domain mixing: equal target proportions per source (in a real
    # recipe these weights come from the data strategy — the Pile /
    # LLaMA per-source proportions); deterministic per doc_id, so the
    # mixture is itself reproducible release-to-release.
    # `mixed` is persisted: everything downstream (DSIR fit = two
    # featurization scans, the sample's quantile pass, packing) would
    # otherwise re-execute the whole quality→dedup→mask→mixture
    # lineage per action (review r5).
    src_values = [
        r["source"] for r in released.select("source").distinct().collect()
    ]
    mixed = mixture_sample(
        released,
        {s: 1.0 for s in src_values},
        by="source",
        salt="mix-2026-08",
    ).persist()
    n_mixed = mixed.count()
    print(f"mixture: {prep.n_after_decontam} → {n_mixed} docs "
          f"(equal-weight over {len(src_values)} sources)")

    # DSIR stage: importance-resample toward a target distribution
    # (arXiv:2302.03169) — here the corpus's own English slice stands
    # in for a curated reference like Wikipedia. Deterministic:
    # hashed-n-gram multinomials + salted-md5 Gumbel noise, so the
    # same documents are selected on any engine or cluster size.
    from goodtables_pandas_py_spark.extensions.dsir import dsir_sample

    dsir_target = mixed.where(F.col("lang") == "en").select(
        "doc_id", "text"
    )
    selected = dsir_sample(
        mixed, dsir_target, fraction=0.9, num_buckets=4096,
        salt="dsir-2026-08",
    )
    n_selected = selected.count()
    print(f"dsir: {n_mixed} → {n_selected} docs toward the en reference")

    # quality bins (r6): label the selection with CCNet-style LM
    # quality quartiles — unigram cross-entropy self-trained on the
    # selection (lower = more natural text), thresholds from ONE
    # sketch pass, labeling map-only. The bin column rides into the
    # release so downstream training can curriculum-order or
    # re-weight without recomputing the signal.
    from goodtables_pandas_py_spark.extensions.splits import quality_bins
    from goodtables_pandas_py_spark.extensions.text import unigram_logprob

    # CUT THE LINEAGE at the selection boundary: everything below
    # composes `selected` into plans that contain it several times
    # over (score join, bin labeling, BPE count join), and each tree
    # copy drags the ENTIRE quality→dedup→span→decontam→mixture→dsir
    # logical plan through Catalyst analysis again — a persist alone
    # caches the DATA but not the plan, and the example measurably
    # stalled on plan analysis (hundreds of stages) before this
    # truncation. localCheckpoint materializes AND truncates; a real
    # deployment writes the selection as a parquet artifact and reads
    # it back (same effect, plus a restart point).
    selected = selected.localCheckpoint()
    xent = unigram_logprob(selected).select("doc_id", "xent_milli")
    scored = selected.join(xent, "doc_id").withColumn(
        "xent", F.col("xent_milli").cast("double")
    )
    # persist: `binned` feeds the bin rollup, the BPE word-count agg,
    # the BPE encode pass, AND the release writes — un-persisted,
    # each of those would replay the unigram fit+score lineage
    binned = quality_bins(scored, "xent", n_bins=4).drop("xent").persist()
    bin_counts = {
        str(r["quality_bin"]): r["n"]
        for r in binned.groupBy("quality_bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"quality bins (xent quartiles): {bin_counts}")

    # BPE token counts (r6): training budgets are set in TOKENIZER
    # tokens, not whitespace words — fit a small merge list on the
    # selection (one word-count agg + driver loop) and pack by the
    # learned-vocab counts. The whitespace proxy stays in the audit
    # as n_ws_tokens for comparison.
    from goodtables_pandas_py_spark.extensions.bpe import (
        bpe_fit,
        bpe_token_counts,
    )

    merges = bpe_fit(binned, n_merges=200, max_words=20_000)
    print(f"bpe: fitted {len(merges)} merges")
    bpe_counts = bpe_token_counts(binned, merges)
    packed = sequence_offsets(
        hash_split(binned, "doc_id", salt="release-2026-08")
        .withColumn("n_ws_tokens", token_count(F.col("text")))
        .join(bpe_counts, "doc_id")
        .withColumnRenamed("n_bpe_tokens", "n_tokens"),
        budget=2048,
        part_col="source",
    )
    # deterministic training shuffle (r8): one hash exchange gives the
    # trainer a reproducible pseudo-random traversal of the corpus —
    # the files, streamed in name order, are the epoch-0 permutation
    from goodtables_pandas_py_spark.extensions.splits import (
        training_shuffle,
    )

    shuffled = training_shuffle(
        packed, salt="epoch0-2026-08", partitions=32
    )
    # versioned publish: immutable snapshot + atomic CURRENT pointer
    # swap — a re-run of this script becomes v2 and readers of v1 keep
    # their snapshot (keep_versions retains one cycle of grace). r8:
    # INCREMENTAL — a re-run whose splits are byte-identical hardlinks
    # them into the new version instead of rewriting (manifest
    # fingerprints decide; first publish is automatically a full one)
    from goodtables_pandas_py_spark.extensions.pipeline import (
        write_release_increment,
    )

    release_manifest = write_release_increment(
        shuffled,
        f"{out}/release",
        keep_versions=3,
        manifest_extra={
            "split_salt": "release-2026-08",
            "dedup_threshold": 0.5,
            "span_dedup_k": 20,
            "decontam": {"ngram": 3, "min_ratio": 0.8},
            "dsir": {"fraction": 0.9, "num_buckets": 4096,
                     "salt": "dsir-2026-08"},
            "pack_budget": 2048,
            "tokenizer": {"kind": "bpe", "n_merges": len(merges),
                          "max_words": 20_000},
            "quality_bins": {"signal": "unigram_xent_milli",
                             "n_bins": 4},
        },
    )
    split_counts = release_manifest["row_counts"]
    print(f"splits: {split_counts}")
    if "incremental" in release_manifest:
        inc = release_manifest["incremental"]
        print(
            f"incremental publish over {inc['base_version']}: "
            f"reused {inc['reused']}, rewrote {inc['rewritten']}"
        )

    # r9 lifecycle tail — the operations a LIVING corpus needs after
    # its first publishes:
    # 1. REVISE rows in place (a re-scoring pass touched 3 docs) via
    #    MERGE — only the partitions holding those ids rewrite, and a
    #    re-run of the same merge publishes nothing (idempotent)
    from goodtables_pandas_py_spark.extensions.pipeline import (
        compact_release_version,
        read_release,
        vacuum_release_orphans,
        write_release_merge,
    )

    current, _ = read_release(spark, f"{out}/release")
    revised = (
        current.orderBy("doc_id").limit(3)
        # a synthetic re-scoring pass: bump the bin so the revision is
        # guaranteed to differ (an identical merge would be a no-op)
        .withColumn("quality_bin", F.col("quality_bin") + F.lit(10))
    )
    merge_manifest = write_release_merge(
        revised, f"{out}/release", keep_versions=3
    )
    minc = merge_manifest.get("incremental", {})
    if minc.get("merge"):
        print(
            f"merge publish over {minc['base_version']}: rewrote "
            f"{minc['rewritten']}, reused {len(minc['reused'])} "
            "partitions"
        )
    # 2. COMPACT fragmented partitions (equality proven by manifest
    #    fingerprints) and 3. VACUUM orphan dirs from crashed writers
    compact_manifest = compact_release_version(
        spark, f"{out}/release", keep_versions=3
    )
    if compact_manifest.get("incremental", {}).get("compaction"):
        print(
            "compacted partitions: "
            f"{compact_manifest['incremental']['rewritten']}"
        )
    orphans = vacuum_release_orphans(spark, f"{out}/release")
    print(f"vacuumed orphan version dirs: {orphans or 'none'}")

    with open(f"{out}/summary.json", "w") as f:
        json.dump(
            {
                "valid": report["valid"],
                "error_count": report["error-count"],
                "n_input": prep.n_input,
                "n_after_quality": prep.n_after_quality,
                "n_after_dedup": prep.n_after_dedup,
                "n_after_cap": prep.n_after_cap,
                "n_after_span_mask": prep.n_after_span_mask,
                "n_after_decontam": prep.n_after_decontam,
                "n_mixed": n_mixed,
                "n_dsir_selected": n_selected,
                "quality_bin_counts": bin_counts,
                "bpe_merges": len(merges),
                "split_counts": split_counts,
            },
            f,
        )
    print(f"artifacts in {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
