"""DSIR-style importance resampling (X7d): select raw-corpus
documents whose hashed n-gram distribution matches a TARGET corpus —
Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (arXiv:2302.03169), re-expressed Spark-first.

The method: featurize every document as a bag of hashed n-grams
(unigrams + bigrams hashed into ``num_buckets`` buckets), fit two
bag-of-hashed-ngrams multinomials — one on the target corpus (the
distribution you WANT, e.g. Wikipedia-ish text), one on the raw
corpus — and weight each raw document by its log importance ratio
``sum_f log(p_target(f) / p_raw(f))`` over its feature occurrences.
Resampling k documents without replacement proportionally to the
weights is then one Gumbel-top-k pass.

Scale shape, stage by stage:

- **featurize** — pure Column algebra per row (split, shingle,
  md5-bucket); the bucket id is the ENGINE-PORTABLE first-8-hex-chars
  md5 integer (same construction as :func:`~.splits.hash_bucket`),
  so weights are bit-reproducible across Spark, DuckDB, and Python;
- **fit** — one explode + map-side-combined groupBy per corpus; the
  result is AT MOST ``num_buckets`` rows by construction (the whole
  point of feature hashing) — a bounded, broadcastable model no
  matter how large the corpora are;
- **score** — per-bucket log-ratios are precomputed ONCE into exact
  integer milli-nats (floats summed per-doc would be order-dependent;
  integers make every weight bit-stable across engines and
  partitionings), then the per-doc score is explode → broadcast join
  against the <= num_buckets model → sum. Zipf skew in bucket ids is
  irrelevant map-side;
- **resample** — Gumbel-top-k: key = log-weight + Gumbel noise
  derived deterministically from a salted md5 of the id (no RNG, no
  seed-partitioning coupling — the same doc set is selected on any
  cluster size or engine). Exact ``k`` runs as TakeOrderedAndProject;
  for cluster-scale selections use ``fraction`` instead, which cuts
  at an approxQuantile threshold (one extra pass, no single-node
  top-k bottleneck).

Laplace smoothing (+1 per bucket) keeps unseen buckets finite, as in
the reference implementation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import whitespace_tokens

__all__ = [
    "hashed_ngram_buckets",
    "bucket_counts",
    "dsir_logratio_model",
    "dsir_score",
    "dsir_logweights",
    "dsir_sample",
]

_HEX_SPACE = 16 ** 8


def _bucket(feature: Column, num_buckets: int) -> Column:
    """Engine-portable feature hash: first 8 hex chars of md5 as an
    integer, mod ``num_buckets`` (DuckDB twin:
    ``CAST('0x' || substr(md5(f),1,8) AS UBIGINT) % B``)."""
    h = F.conv(F.substring(F.md5(feature.cast("binary")), 1, 8), 16, 10)
    return (h.cast("bigint") % num_buckets).alias("bucket")


def hashed_ngram_buckets(
    text: Column, num_buckets: int = 10_000, ngrams: tuple[int, ...] = (1, 2)
) -> Column:
    """array<bigint> of hashed n-gram bucket ids, one per n-gram
    OCCURRENCE (a bag, not a set — DSIR counts multiplicity), over
    lowercased whitespace tokens. Pure Column algebra.

    Plan-shape note: n-grams are built with ``zip_with`` over shifted
    ``slice``s of the token array — zip_with's operands are evaluated
    ONCE per row. The tempting alternative (``transform(sequence(...),
    i -> concat_ws(' ', slice(toks, i+1, n)))``) closes over the
    ``toks`` EXPRESSION, which Catalyst inlines into the lambda and
    re-evaluates the whitespace split per element — measured O(n²)
    per document (review r5: 1.5→4.4→17.9→68 s for 500/1k/2k/4k
    tokens; flat after this rewrite)."""
    toks = whitespace_tokens(F.lower(text))
    parts = []
    for n in ngrams:
        if n == 1:
            grams = toks
        else:
            m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
            grams = F.slice(toks, 1, m)
            for j in range(1, n):
                grams = F.zip_with(
                    grams,
                    F.slice(toks, j + 1, m),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
        parts.append(grams)
    allg = parts[0] if len(parts) == 1 else F.concat(*parts)
    return F.transform(allg, lambda g: _bucket(g, num_buckets))


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    num_buckets: int = 10_000,
    ngrams: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Fit half of the DSIR model: ``(bucket BIGINT, cnt BIGINT)``
    occurrence counts over a corpus — at most ``num_buckets`` rows.
    explode_outer + null filter, NOT plain explode: the inferred
    ``size(...) > 0`` pushdown filter for a non-outer generate
    re-evaluates the whole featurization per row (see
    :func:`~.spans.window_hashes`); generated-column filters are
    free. A real bucket id is never null (md5 of a non-null token)."""
    return (
        df.select(
            F.explode_outer(
                hashed_ngram_buckets(F.col(text_col), num_buckets, ngrams)
            ).alias("bucket")
        )
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_logratio_model(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    num_buckets: int = 10_000,
) -> tuple[DataFrame, int, int]:
    """Per-bucket log importance ratios in exact integer milli-nats —
    returns ``(model_df, n_target, n_raw)`` where ``model_df`` is
    ``(bucket BIGINT, milli BIGINT)`` with
    ``milli = round((ln(ct+1) - ln(Nt+B) - ln(cr+1) + ln(Nr+B))*1000)``
    (Laplace +1, B = num_buckets). Buckets absent from BOTH corpora
    are omitted — their ratio is the constant ``ln(Nr+B)-ln(Nt+B)``
    which a document can only hit via a feature neither corpus
    contains, impossible when scoring the raw corpus itself; callers
    scoring foreign text get the same treatment as the reference
    (unseen-unseen features contribute the smoothed constant, which
    we fold in by emitting those buckets from the scored side's
    join-miss — see :func:`dsir_logweights`)."""
    nt = target_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    nr = raw_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    t = target_counts.select("bucket", F.col("cnt").alias("ct"))
    r = raw_counts.select("bucket", F.col("cnt").alias("cr"))
    both = t.join(r, "bucket", "full").select(
        "bucket",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cr", F.lit(0)).alias("cr"),
    )
    milli = F.floor(
        (
            F.log(F.col("ct").cast("double") + 1.0)
            - F.lit(math.log(float(nt + num_buckets)))
            - F.log(F.col("cr").cast("double") + 1.0)
            + F.lit(math.log(float(nr + num_buckets)))
        )
        * 1000
        + F.lit(0.5)
    ).cast("bigint")
    return both.select("bucket", milli.alias("milli")), nt, nr


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    ngrams: tuple[int, ...] = (1, 2),
    raw_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weights of ``df`` (the raw
    corpus) toward ``target`` (the wanted distribution):
    ``(id_col, n_feats BIGINT, logw_milli BIGINT, logw DOUBLE)``.
    ``logw`` is nats (= logw_milli / 1000 — derived from the exact
    integer, so it is bit-stable too). Documents with no features
    (empty/null text) surface with ``n_feats = 0`` and null weights.

    Feature occurrences that miss the model table (possible only when
    scoring documents OUTSIDE the raw corpus the model was fit on)
    contribute the smoothed unseen-unseen constant
    ``ln(Nr+B) - ln(Nt+B)``.

    The two count frames are persisted before the model math: each is
    consumed twice (the total-collect and the full-outer model join),
    and un-persisted that would re-run the corpus featurization scans
    — the most expensive stage — 2-3x (review r5). The persisted
    frames are <= num_buckets rows each. An externally supplied
    ``raw_counts`` gets the same treatment (persisted here unless the
    caller already did — advisor r5), since its lineage usually
    includes the same full-corpus featurization."""
    from ..cacheutil import attach_persisted

    tc = bucket_counts(target, text_col, num_buckets, ngrams).persist()
    own = [tc]
    rc = raw_counts
    if rc is None:
        rc = bucket_counts(df, text_col, num_buckets, ngrams).persist()
        own.append(rc)
    elif not (
        rc.storageLevel.useMemory
        or rc.storageLevel.useDisk
        or rc.storageLevel.useOffHeap
    ):
        rc = rc.persist()
        own.append(rc)
    model, nt, nr = dsir_logratio_model(tc, rc, num_buckets)
    out = dsir_score(
        df, model, nt, nr, id_col, text_col, num_buckets, ngrams
    )
    # attach OUR persists for caller release (cacheutil contract —
    # r11 review; a caller-persisted raw_counts stays the caller's)
    return attach_persisted(out, *own)


def dsir_score(
    df: DataFrame,
    model: DataFrame,
    n_target: int,
    n_raw: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    ngrams: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Score documents against a PRE-FITTED DSIR model — the serving
    shape: fit :func:`dsir_logratio_model` ONCE in batch over the
    corpora, persist the <= num_buckets-row model table, then score
    anywhere — a later batch, another cluster, or every micro-batch
    of an ingest stream (see
    :mod:`~goodtables_pandas_py_spark.streaming.score`) — without
    touching the fit corpora again. Same output contract as
    :func:`dsir_logweights` (which is fit+score fused).

    ``n_target`` / ``n_raw`` are the fitted total feature counts
    (returned by :func:`dsir_logratio_model`); they determine the
    smoothed unseen-unseen constant that join-miss features score."""
    unseen_milli = int(
        math.floor(
            (
                math.log(float(n_raw + num_buckets))
                - math.log(float(n_target + num_buckets))
            )
            * 1000
            + 0.5
        )
    )
    feats = df.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), num_buckets, ngrams)
        ).alias("bucket"),
    ).where(F.col("bucket").isNotNull())
    scored = feats.join(F.broadcast(model), "bucket", "left").select(
        id_col,
        F.coalesce("milli", F.lit(unseen_milli)).alias("__m"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        F.sum("__m").cast("bigint").alias("logw_milli"),
    )
    out = (
        df.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            "logw_milli",
        )
    )
    return out.withColumn(
        "logw", F.col("logw_milli").cast("double") / 1000.0
    )


def dsir_sample(
    df: DataFrame,
    target: DataFrame,
    k: int | None = None,
    fraction: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    ngrams: tuple[int, ...] = (1, 2),
    salt: str = "dsir-v1",
    weights: DataFrame | None = None,
) -> DataFrame:
    """Gumbel-top-k resampling without replacement, proportional to
    the DSIR importance weights: returns the selected rows of ``df``
    (all original columns). Exactly one of ``k`` / ``fraction``.

    The Gumbel key is ``logw + (-ln(-ln(u)))`` with
    ``u = (md5int(salt || id) + 0.5) / 2^32`` — deterministic,
    engine-portable, independent of partitioning (contrast
    ``df.sample``, whose output changes with seed-partition
    coupling). ``k`` uses TakeOrderedAndProject (driver holds k ids);
    ``fraction`` cuts at an approxQuantile threshold of the key — the
    cluster-scale path (no single-node top-k; selection size is then
    approximate to the quantile sketch's resolution).

    Zero-feature documents (null weights) are never selected."""
    if (k is None) == (fraction is None):
        raise ValueError("pass exactly one of k / fraction")
    w = weights
    if w is None:
        w = dsir_logweights(
            df, target, id_col, text_col, num_buckets, ngrams
        )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.col(id_col).cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / float(_HEX_SPACE)
    from ..cacheutil import attach_persisted, get_persisted

    # internally-computed weights carry their own attached persists
    # (tc/rc) — re-attach them to whatever we return so callers can
    # release everything through the one contract (r11 review)
    inherited = get_persisted(w) if weights is None else []
    keyed = w.where(F.col("logw").isNotNull()).select(
        id_col, (F.col("logw") - F.log(-F.log(u))).alias("__key")
    )
    if k is not None:
        picked = keyed.orderBy(F.col("__key").desc(), id_col).limit(k)
    else:
        if not 0.0 < fraction <= 1.0:
            raise ValueError("fraction must be in (0, 1]")
        # keyed's lineage includes the full explode/score/rollup when
        # weights are computed internally, and the fraction path
        # executes it twice (quantile sketch + final semi-join) —
        # persist so the scoring stage runs once (advisor r5)
        keyed = keyed.persist()
        qs = keyed.approxQuantile("__key", [1.0 - fraction], 1e-4)
        if not qs:  # every doc weightless (empty/null text) or df empty
            keyed.unpersist()
            for f in inherited:
                f.unpersist()
            return df.where(F.lit(False))
        picked = keyed.where(F.col("__key") >= qs[0])
        # keyed is O(num_docs) rows — attach it so callers can release
        # (cacheutil contract, r11 review); the k-path never persists it
        return attach_persisted(
            df.join(picked.select(id_col), id_col, "left_semi"),
            keyed,
            *inherited,
        )
    return attach_persisted(
        df.join(picked.select(id_col), id_col, "left_semi"), *inherited
    )
