"""Streaming document scoring (X4/X5): score ingested documents
against PRE-FITTED corpus models. The expensive corpus-level fit
(unigram token frequencies, DSIR bucket multinomials) runs ONCE in
batch over the existing corpus; the per-batch scoring path is a
stateless explode → broadcast-model join → batch-local per-doc
rollup, so it rides ``foreachBatch`` with no stream-scoped state at
all. Each micro-batch must carry WHOLE documents (one row per doc —
the ingest shape everywhere else in this package); the per-doc
aggregation is then batch-local by construction.

Because both scorers emit exact integer milli-nats (see
:func:`~goodtables_pandas_py_spark.extensions.text.unigram_logprob`
and :func:`~goodtables_pandas_py_spark.extensions.dsir.dsir_score`),
stream scores are BIT-IDENTICAL to what the same documents would get
in a batch run — asserted end-to-end in tests/test_streaming.py.

Growing models: both helpers accept a zero-arg callable in place of
the model DataFrame (re-resolved each batch — same contract as
:func:`~goodtables_pandas_py_spark.streaming.dedup._resolve`), so a
nightly re-fit lands on the stream without a restart.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..extensions.dsir import dsir_score
from ..extensions.text import bigram_logprob, unigram_logprob
from .dedup import _resolve

__all__ = [
    "unigram_score_foreach_batch",
    "bigram_score_foreach_batch",
    "dsir_score_foreach_batch",
]


def unigram_score_foreach_batch(
    freqs: DataFrame | Callable[[], DataFrame],
    on_scored: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    head_vocab: int = 100_000,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` handler: per-document unigram cross-entropy of
    each micro-batch against a pre-fitted frequency table (CCNet-style
    quality scoring at ingest). ``on_scored(scored_df, batch_id)``
    receives the :func:`unigram_logprob` output for the batch —
    route it to a sink, a quarantine filter, or a metrics rollup.

    A static ``freqs`` DataFrame is persisted ONCE at handler
    creation, so the per-batch total/head derivations are cheap
    aggregates of the cached table, never a re-scan of wherever the
    table came from (review r5). A callable re-resolves (and is NOT
    persisted here — the nightly re-fit owns its own lifecycle)."""
    if not callable(freqs):
        freqs = freqs.persist()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from ..cacheutil import unpersist_scan_state

        scored = unigram_logprob(
            batch_df,
            freqs=_resolve(freqs),
            id_col=id_col,
            text_col=text_col,
            lowercase=lowercase,
            head_vocab=head_vocab,
        )
        try:
            on_scored(scored, batch_id)
        finally:
            # unigram_logprob persists the per-batch exploded-tokens
            # frame and attaches it (cacheutil contract) — release it
            # after the sink, like the dedup handlers, or a long
            # stream accumulates one cached frame PER MICRO-BATCH
            # (r11 review)
            unpersist_scan_state(scored)

    return handle


def bigram_score_foreach_batch(
    counts: tuple[DataFrame, DataFrame]
    | Callable[[], tuple[DataFrame, DataFrame]],
    on_scored: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    head_vocab: int = 100_000,
    backoff: float = 0.4,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` handler: stupid-backoff bigram cross-entropy
    of each micro-batch against pre-fitted ``(uni_counts,
    bi_counts)`` tables (the conditional-LM quality signal at
    ingest). The two count tables travel together — like the DSIR
    triple, a re-fit must replace both or backoff constants skew.
    Static tables are persisted once at handler creation; the
    PER-BATCH stage persists inside :func:`bigram_logprob` are
    turned OFF (``persist=False``) — caching three frames per
    micro-batch would churn executor storage, and replaying a
    micro-batch-sized pair explode a few times is cheaper than the
    cache writes."""
    if not callable(counts):
        uni, bi = counts
        counts = (uni.persist(), bi.persist())

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        uni, bi = _resolve(counts)
        scored = bigram_logprob(
            batch_df,
            uni_counts=uni,
            bi_counts=bi,
            id_col=id_col,
            text_col=text_col,
            lowercase=lowercase,
            head_vocab=head_vocab,
            backoff=backoff,
            persist=False,
        )
        on_scored(scored, batch_id)

    return handle


def dsir_score_foreach_batch(
    fitted: tuple[DataFrame, int, int]
    | Callable[[], tuple[DataFrame, int, int]],
    on_scored: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    ngrams: tuple[int, ...] = (1, 2),
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` handler: DSIR log importance weights of each
    micro-batch against a pre-fitted log-ratio model (see
    :func:`~goodtables_pandas_py_spark.extensions.dsir.dsir_score` —
    the serving shape). ``fitted`` is the FULL
    ``(model, n_target, n_raw)`` triple exactly as
    :func:`~goodtables_pandas_py_spark.extensions.dsir
    .dsir_logratio_model` returns it — the totals travel WITH the
    model because the join-miss unseen constant is derived from them:
    a re-fit that replaced only the model table but kept stale totals
    would silently mis-score every unseen feature (review r5). For a
    nightly re-fit pass a zero-arg callable returning the new triple;
    a static triple's model is persisted once at handler creation.
    ``on_scored`` gets ``(id, n_feats, logw_milli, logw)`` per batch
    document."""
    if not callable(fitted):
        model, n_target, n_raw = fitted
        fitted = (model.persist(), n_target, n_raw)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        model, n_target, n_raw = _resolve(fitted)
        scored = dsir_score(
            batch_df,
            model,
            n_target,
            n_raw,
            id_col=id_col,
            text_col=text_col,
            num_buckets=num_buckets,
            ngrams=ngrams,
        )
        on_scored(scored, batch_id)

    return handle
