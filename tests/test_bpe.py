"""BPE tokenizer (extensions/bpe.py, r6): driver fit on the word-count
summary, Arrow-batched encode. The independent reference for encode
parity REPLAYS the training merges in order (the textbook definition);
the implementation uses rank-based inference — the two formulations
must agree everywhere."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from goodtables_pandas_py_spark.extensions.bpe import (
    EOW,
    _merge_word,
    _word_symbols,
    bpe_encode,
    bpe_fit,
    bpe_token_counts,
    encode_word,
    fit_bpe_merges,
)


def _replay_encode(word: str, merges) -> list[str]:
    """Independent reference: apply the training merges IN ORDER."""
    syms = _word_symbols(word)
    for m in merges:
        syms = _merge_word(syms, tuple(m))
    return list(syms)


def test_fit_classic_example():
    # Sennrich-style toy corpus: 'low' x5, 'lower' x2, 'newest' x6
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = fit_bpe_merges(counts, 4)
    # 'es' appears in newest(6)+widest(3)=9 — the top pair; then
    # 'es'+'t</w>' (9), then ties resolve lexicographically
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", f"t{EOW}")
    assert len(merges) == 4
    # determinism: same input, same merges
    assert fit_bpe_merges(counts, 4) == merges


def test_merge_word_leftmost_nonoverlapping():
    assert _merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert _merge_word(("b", "a", "a"), ("a", "a")) == ("b", "aa")
    assert _merge_word((), ("a", "a")) == ()


def test_encode_word_matches_replay():
    counts = [("banana", 3), ("bandana", 2), ("ban", 5)]
    merges = fit_bpe_merges(counts, 6)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ("banana", "bandana", "ban", "append", "b", ""):
        assert encode_word(w, ranks) == _replay_encode(w, merges), w


_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_WORD, st.integers(1, 50)), min_size=1,
                max_size=15), st.integers(0, 12), _WORD)
def test_encode_property_rank_inference_equals_replay(corpus, n, probe):
    merges = fit_bpe_merges(corpus, n)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    words = [w for w, _ in corpus] + [probe]
    for w in words:
        got = encode_word(w, ranks)
        assert got == _replay_encode(w, merges), (w, merges)
        # lossless: pieces concatenate back to word + EOW
        assert "".join(got) == w + EOW


@pytest.mark.slow
def test_spark_fit_and_encode_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = bpe_fit(docs, n_merges=50, max_words=5_000)
    assert len(merges) == 50
    enc = bpe_encode(docs, merges).collect()
    assert len(enc) == 200
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    by_id = {r["doc_id"]: r for r in enc}
    # spot-check three docs against the pure-Python path
    for r in docs.select("doc_id", "text").limit(3).collect():
        expect = []
        for w in (r["text"] or "").lower().split():
            expect.extend(encode_word(w, ranks))
        got = by_id[r["doc_id"]]
        assert list(got["bpe_tokens"]) == expect
        assert got["n_bpe_tokens"] == len(expect)
    # counts-only twin agrees and drops the arrays
    cnts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert cnts == {r["doc_id"]: r["n_bpe_tokens"] for r in enc}
    # a learned vocab compresses: fewer BPE tokens than characters,
    # more than (or equal to) whitespace words
    words = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n"),
        ).collect()
    }
    assert all(cnts[i] >= words[i] for i in cnts)


def test_null_and_empty_text_encode_to_zero(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "hi")],
        "doc_id long, text string",
    )
    merges = [("h", f"i{EOW}")]
    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for i in (1, 2, 3):
        assert got[i]["n_bpe_tokens"] == 0
        assert list(got[i]["bpe_tokens"]) == []
    assert list(got[4]["bpe_tokens"]) == [f"hi{EOW}"]


def test_encode_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bpe_token_counts(docs, [("e", "s")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_encode_carries_custom_id_col_name_and_type(spark):
    """r7 ADVICE regression: a string id column under a non-default
    name must survive the Arrow boundary under its own name/dtype —
    and bpe_token_counts' select(id_col, ...) must resolve."""
    df = spark.createDataFrame(
        [("doc-a", "hi hi"), ("doc-b", "yo")],
        "uri string, text string",
    )
    merges = [("h", f"i{EOW}")]
    enc = bpe_encode(df, merges, id_col="uri")
    assert [f.name for f in enc.schema.fields][0] == "uri"
    assert enc.schema["uri"].dataType.simpleString() == "string"
    got = {r["uri"]: r["n_bpe_tokens"] for r in enc.collect()}
    assert got == {"doc-a": 2, "doc-b": 2}
    cnt = bpe_token_counts(df, merges, id_col="uri")
    assert {r["uri"]: r["n_bpe_tokens"] for r in cnt.collect()} == got


def test_encode_prunes_unread_columns_from_arrow_transfer(spark):
    """The Arrow transfer ships only (id_col, text_col) — a wide
    payload column must be pruned out of the mapInPandas input."""
    df = spark.createDataFrame(
        [(1, "a b", "X" * 10)], "doc_id long, text string, huge string"
    )
    plan = (
        bpe_encode(df, [("a", f"b{EOW}")])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the source relation line still lists every column it HAS; the
    # MapInPandas input and the Project feeding it must not read huge
    map_and_project = [
        ln for ln in plan.splitlines()
        if "MapInPandas" in ln or "Project" in ln
    ]
    assert map_and_project and all(
        "huge" not in ln for ln in map_and_project
    ), plan
