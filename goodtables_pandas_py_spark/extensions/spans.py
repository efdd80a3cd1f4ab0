"""Exact-substring span deduplication (X2c): find and mask token
spans that occur verbatim more than once across a corpus — the
ExactSubstr operator of Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better" (arXiv:2107.06499), re-expressed
Spark-first at token-window granularity.

The paper builds a suffix array over the concatenated corpus; a
suffix array is a single sequential data structure and does not
shard. The Spark-native equivalent decomposes the same predicate —
"this k-token window appears >= min_count times in the corpus" —
into embarrassingly parallel window hashing plus one hash-keyed
count, the same two-phase hash-count/string-verify shape as
:func:`~.text.remove_boilerplate_lines`:

1. **window hashing** — per doc, per-token ``xxhash64`` longs are
   materialized once, then every k-window's hash is one
   ``xxhash64`` over k array lookups, all inside the per-doc row
   (no strings are built, no per-window arrays are copied); one
   ``posexplode`` emits lean ``(id, start, whash)`` rows — the same
   row-count class as the MinHash shingle explode (~n_tokens rows
   per doc, ~20 B each);
2. **hash count** — ``groupBy(whash)`` with map-side combine;
   windows with total occurrence count >= ``min_count`` are
   CANDIDATES. Collisions can only overcount, never miss;
3. **string verify** (``verify=True``) — token arrays are re-shipped
   ONLY for documents that own a candidate window (left-semi join),
   candidate window strings are materialized there, and the count is
   re-taken on exact strings: a 64-bit collision costs shuffle
   bytes, never a wrongly masked span. The candidate set is NOT
   broadcast: in a real crawl up to ~10% of tokens sit in duplicated
   spans (Lee et al. §4), so the hot-hash set scales with the corpus
   — it stays a shuffled semi-join and AQE may downgrade it to a
   broadcast when it is actually small;
4. **interval merge** — duplicated windows overlap heavily (a
   duplicated run of L tokens yields L-k+1 windows); a
   gaps-and-islands pass per document (one shuffle on the doc id)
   merges touching/overlapping windows into maximal
   ``[span_start, span_end)`` token spans.

Unlike the suffix-array formulation this finds duplicates at k-token
window resolution, not arbitrary byte offsets: a duplicated run of
length >= k is found in full (every window inside it is duplicated);
runs shorter than k are below the dedup threshold by definition
(the paper uses 50 BPE tokens; default here is 20 whitespace
tokens).

Scope note: occurrences are counted CORPUS-WIDE (a window repeated
twice inside one document counts), matching the paper's "substring
occurring more than once in the corpus". Masking removes EVERY
occurrence (the released deduplicate-text-datasets default, which
the paper notes is aggressive but empirically best); use
:func:`~.dedup.exact_dedup` / :func:`~.dedup.near_dedup` first when
whole-document survivorship (keep one copy) is wanted.

No UDFs anywhere; everything is Column algebra + three shuffles
(hash count, doc semi-join/verify, island merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import whitespace_tokens

__all__ = ["window_hashes", "dup_spans", "mask_dup_spans"]


def window_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """One row per k-token window: ``(id_col, start, whash)`` with
    ``start`` the 0-based token offset and ``whash`` the xxhash64 over
    the window's k per-token hashes. Documents with fewer than k
    tokens (or null text) yield no rows.

    Two plan-shape traps, both measured quadratic before the fix
    (review r5: 97 s for twenty 500-token docs; linear after):

    - the per-token hash array MUST be a materialized column of its
      own projection before the window pass references it — a
      lambda-closure reference to the ``transform(toks, xxhash64)``
      expression is inlined k times into the window lambda and
      re-evaluated per element (O(n²·k) per doc). As an attribute
      reference each ``element_at`` is an O(1) lookup, and
      CollapseProject keeps the projections separate because the
      alias is referenced more than once and is non-cheap;
    - the explode must be ``posexplode_outer`` + a cheap null filter
      on the GENERATED columns: for plain ``posexplode``, Spark's
      InferFiltersFromGenerate injects ``size(__whs) > 0`` and
      PushDownPredicates substitutes the alias chain all the way back
      to raw text — one filter evaluation then rebuilds the whole
      window array with the un-materialized O(n²·k) form. Outer
      generate infers no filter; empty/short docs surface as one
      null row dropped post-generate.

    Net cost per doc: n token hashes + (n-k+1)·k long lookups, zero
    strings; the exploded rows carry three scalars — never the token
    array."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = whitespace_tokens(F.col(text_col))
    hashed = df.select(
        F.col(id_col),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("__th"),
    )
    n = F.size("__th")
    th = F.col("__th")
    whs = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda s: F.xxhash64(
                *[F.element_at(th, s + j + 1) for j in range(k)]
            ),
        ),
    )
    base = hashed.select(F.col(id_col), whs.alias("__whs"))
    return (
        base.select(
            id_col, F.posexplode_outer("__whs").alias("start", "whash")
        )
        .where(F.col("start").isNotNull())
        .select(
            id_col, F.col("start").cast("bigint").alias("start"), "whash"
        )
    )


def dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    min_count: int = 2,
    verify: bool = True,
    persist: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    ``(id_col, span_start, span_end)`` — 0-based token coordinates,
    end-exclusive, overlapping/touching windows merged. A span means:
    every k-token window inside it occurs >= ``min_count`` times in
    the corpus (exact string equality when ``verify=True``; 64-bit
    hash equality otherwise — collisions can only ADD spans, so the
    verified output is always a subset of the unverified one).

    ``persist`` caches the two frames the plan consumes twice — the
    window table (hot-hash count AND candidate semi-join) and the
    candidate window strings (string count AND occurrence filter) —
    so one call costs one tokenize+hash+explode scan, not ~4
    (review r5). Both are lean: ~20 B/window and candidates-only
    strings. Turn off only when the caller wraps the whole thing in
    its own persist scope."""
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    wins = window_hashes(df, id_col, text_col, k)
    if persist:
        wins = wins.persist()
    hot = (
        wins.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_count)
        .select("whash")
    )
    cand = wins.join(hot, "whash", "left_semi")
    if verify:
        docs = cand.select(id_col).distinct()
        toks = (
            df.select(
                F.col(id_col),
                whitespace_tokens(F.col(text_col)).alias("__toks"),
            )
            .join(docs, id_col, "left_semi")
        )
        strs = cand.join(toks, id_col).select(
            id_col,
            "start",
            F.concat_ws(
                " ", F.slice("__toks", F.col("start").cast("int") + 1, k)
            ).alias("__wstr"),
        )
        if persist:
            strs = strs.persist()
        good = (
            strs.groupBy("__wstr")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") >= min_count)
            .select("__wstr")
        )
        occ = strs.join(good, "__wstr", "left_semi").select(id_col, "start")
    else:
        occ = cand.select(id_col, "start")
    # gaps-and-islands merge. With constant k and rows ordered by
    # start, the running max of span ends over preceding rows IS the
    # previous row's end, so lag() suffices (same pattern as
    # temporal.session_ids).
    by_doc = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.lag(F.col("start") + k).over(by_doc)
    brk = F.when(
        prev_end.isNull() | (F.col("start") > prev_end), 1
    ).otherwise(0)
    run = Window.partitionBy(id_col).orderBy("start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grouped = occ.select(
        id_col, "start", F.sum(brk).over(run).alias("__isl")
    )
    return (
        grouped.groupBy(id_col, "__isl")
        .agg(
            F.min("start").cast("bigint").alias("span_start"),
            (F.max("start") + k).cast("bigint").alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def mask_dup_spans(
    df: DataFrame,
    spans: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    min_count: int = 2,
    verify: bool = True,
    persist: bool = True,
) -> DataFrame:
    """Remove every duplicated span from every document: ``text_col``
    is rebuilt from the surviving tokens (single-space joined — the
    token-space contract of :func:`~.text.chunk_text`), all other
    columns pass through. ``spans`` defaults to
    :func:`dup_spans` over ``df`` with the same knobs.

    A document that is entirely duplicated text becomes ``""`` (kept,
    not dropped — run :func:`~.dedup.exact_dedup` first to keep one
    copy of whole-doc duplicates); a document with no duplicated
    spans passes through the cheap join-miss path untouched (modulo
    whitespace normalization, applied uniformly so output text is
    deterministic regardless of which docs carry spans).

    Scale shape: the span table is grouped to one array per affected
    doc (spans per doc are few AFTER interval merging), left-joined on
    the doc id (map-side for inputs bucketed by ``id_col``), and the
    token filter is per-row Column algebra — each token checks the
    few merged spans of its own document."""
    if spans is None:
        spans = dup_spans(df, id_col, text_col, k, min_count, verify, persist)
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            )
        ).alias("__spans")
    )
    joined = df.join(per_doc, id_col, "left")
    toks = whitespace_tokens(F.col(text_col))

    def _keep(tok: Column, i: Column) -> Column:
        hit = F.exists(
            F.col("__spans"),
            lambda sp: (i.cast("bigint") >= sp["s"])
            & (i.cast("bigint") < sp["e"]),
        )
        return F.col("__spans").isNull() | ~hit

    rebuilt = F.array_join(F.filter(toks, _keep), " ")
    # null text stays null (whitespace_tokens(null) -> null -> join null)
    new_text = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
        rebuilt
    )
    return joined.select(
        *[
            new_text.alias(c) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )
