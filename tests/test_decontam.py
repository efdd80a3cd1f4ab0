"""extensions/decontam.py — eval-set contamination scanning.

Contract: exact n-gram overlap, ratio relative to the EVAL document,
corpus side never shuffles (the eval n-gram set broadcasts), and the
drop-set composes with an anti-join to produce a clean corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goodtables_pandas_py_spark.extensions.decontam import (
    contaminated_ids,
    contamination_scan,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely unrelated text about spark physical plans here"),
        (3, "the quick brown fox jumps over something else entirely"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def evals(spark):
    rows = [
        (100, "quick brown fox jumps over the lazy dog"),
        (200, "no overlap with anything in this corpus at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scan_finds_exact_window_overlap(corpus, evals):
    got = {
        (r["corpus_id"], r["eval_id"]): (r["n_matched"], r["n_eval"], r["ratio"])
        for r in contamination_scan(corpus, evals, ngram=8).collect()
    }
    # eval 100 has 8 tokens -> one 8-gram; doc 1 contains it verbatim
    assert (1, 100) in got
    n_matched, n_eval, ratio = got[(1, 100)]
    assert (n_matched, n_eval, ratio) == (1, 1, 1.0)
    # doc 3 shares only a 6-word prefix -> no 8-gram match
    assert all(cid != 3 for cid, _ in got)
    # eval 200 matches nothing
    assert all(eid != 200 for _, eid in got)


def test_scan_ratio_is_relative_to_eval_doc(corpus, evals):
    got = {
        (r["corpus_id"], r["eval_id"]): r["ratio"]
        for r in contamination_scan(corpus, evals, ngram=3).collect()
    }
    # eval 100: 8 tokens -> 6 distinct 3-grams; doc 1 contains all 6
    assert got[(1, 100)] == 1.0
    # doc 3 shares 'quick brown fox', 'brown fox jumps',
    # 'fox jumps over' -> 3/6
    assert got[(3, 100)] == pytest.approx(3 / 6)


def test_min_ratio_and_min_matched_filters(corpus, evals):
    full = contamination_scan(corpus, evals, ngram=3)
    assert full.where(F.col("ratio") <= 0.5).count() > 0
    strict = contamination_scan(corpus, evals, ngram=3, min_ratio=0.9)
    assert {r["corpus_id"] for r in strict.collect()} == {1}
    many = contamination_scan(corpus, evals, ngram=3, min_matched=5)
    assert {r["corpus_id"] for r in many.collect()} == {1}


def test_contaminated_ids_anti_join_composes(corpus, evals):
    drop = contaminated_ids(corpus, evals, ngram=3, min_ratio=0.6)
    clean = corpus.join(
        drop, corpus["doc_id"] == F.col("corpus_id"), "left_anti"
    )
    assert {r["doc_id"] for r in clean.collect()} == {2, 3, 4}


def test_eval_side_broadcasts_corpus_never_shuffles(spark, corpus, evals):
    plan = (
        contamination_scan(corpus, evals, ngram=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_short_docs_and_empty_eval_are_safe(spark, corpus):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert contamination_scan(corpus, empty).count() == 0
    shorts = spark.createDataFrame(
        [(9, "tiny")], "doc_id long, text string"
    )
    # eval doc shorter than the ngram window contributes no n-grams
    assert contamination_scan(corpus, shorts, ngram=8).count() == 0


# --- remove_boilerplate_lines (text.py, same corpus-hygiene family) ------

from goodtables_pandas_py_spark.extensions.text import (  # noqa: E402
    remove_boilerplate_lines,
)


def _boiler_corpus(spark, n_docs=8):
    banner = "accept all cookies to continue"
    rows = []
    for i in range(n_docs):
        body = f"unique content of document number {i} goes right here"
        rows.append((i, f"{banner}\n{body}\n\nfooter {i} fine"))
    rows.append((100, banner))  # pure-boilerplate doc
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_removed_everywhere(spark):
    df = _boiler_corpus(spark)
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate_lines(df, max_docs=3).collect()}
    assert 100 not in out  # pure boilerplate -> dropped
    for i in range(8):
        assert "cookies" not in out[i]
        assert f"unique content of document number {i}" in out[i]
        # original line order preserved
        assert out[i] == (
            f"unique content of document number {i} goes right here"
            f"\n\nfooter {i} fine"
        )


def test_rare_lines_survive(spark):
    df = _boiler_corpus(spark)
    out = remove_boilerplate_lines(df, max_docs=50)
    # threshold above corpus size: nothing removed, texts identical
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    want = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got == want


def test_short_lines_never_count_as_boilerplate(spark):
    rows = [(i, "{\nlong enough unique line %d\n}" % i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate_lines(df, max_docs=2, min_chars=6).collect()}
    # '{' and '}' appear in all 20 docs but are under min_chars -> kept
    assert all(t.startswith("{") and t.endswith("}") for t in out.values())
    assert len(out) == 20


def test_boilerplate_rejects_bad_threshold(spark):
    df = _boiler_corpus(spark)
    with pytest.raises(ValueError):
        remove_boilerplate_lines(df, max_docs=0)


def test_boilerplate_offender_join_broadcasts(spark):
    df = _boiler_corpus(spark)
    plan = (
        remove_boilerplate_lines(df, max_docs=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


# --- PII redaction (text.py, same corpus-hygiene family) -----------------

from goodtables_pandas_py_spark.extensions.text import (  # noqa: E402
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)

_PII_DOC = (
    "contact john.doe+spam@example.co.uk or call +1 (555) 123-4567; "
    "server 192.168.1.254, ssn 123-45-6789, card 4111 1111 1111 1111."
)


def test_redact_pii_scrubs_every_kind(spark):
    df = spark.createDataFrame([(1, _PII_DOC)], "doc_id long, text string")
    out = df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
    assert "example.co.uk" not in out and "@" not in out
    assert "555" not in out and "4111" not in out
    assert "192.168.1.254" not in out and "123-45-6789" not in out
    for kind in ("email", "phone", "ipv4", "ssn", "credit_card"):
        assert f"<{kind}>" in out, (kind, out)
    # non-PII text survives
    assert out.startswith("contact ") and "server" in out


def test_pii_counts_per_kind(spark):
    df = spark.createDataFrame(
        [(1, _PII_DOC), (2, "no pii here at all")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["c"] for r in
            df.select("doc_id", pii_counts(F.col("text")).alias("c")).collect()}
    assert rows[1]["email"] == 1 and rows[1]["ipv4"] == 1
    assert rows[1]["ssn"] == 1 and rows[1]["credit_card"] == 1
    assert rows[1]["phone"] >= 1  # card/ssn digits may also match phone
    assert all(rows[2][k] == 0 for k in rows[2].asDict())


def test_redact_pii_kind_subset_and_unknown(spark):
    df = spark.createDataFrame([(1, _PII_DOC)], "doc_id long, text string")
    out = df.select(
        redact_pii(F.col("text"), kinds=["email"]).alias("t")
    ).first()["t"]
    assert "<email>" in out and "192.168.1.254" in out  # ipv4 untouched
    with pytest.raises(ValueError):
        df.select(redact_pii(F.col("text"), kinds=["dna"]))
    with pytest.raises(ValueError):
        df.select(pii_counts(F.col("text"), kinds=["dna"]))


def test_pii_patterns_are_engine_portable(spark):
    """The reproducibility contract: every pattern must match the SAME
    spans in DuckDB's RE2 engine as in Spark's Java regex."""
    import duckdb

    df = spark.createDataFrame([(1, _PII_DOC)], "doc_id long, text string")
    spark_counts = df.select(pii_counts(F.col("text")).alias("c")).first()["c"]
    con = duckdb.connect()
    for kind, pat in PII_PATTERNS.items():
        [(n,)] = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [_PII_DOC, pat]
        ).fetchall()
        assert n == spark_counts[kind], (kind, n, spark_counts[kind])


def test_redact_pii_null_safe(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert df.select(redact_pii(F.col("text")).alias("t")).first()["t"] is None


# --- property tests (hypothesis) -----------------------------------------

import hashlib  # noqa: E402

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_HYGIENE_FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "kappa"]
_line = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=5
).map(" ".join)
_doc = st.lists(_line, min_size=1, max_size=6).map("\n".join)


def _py_boilerplate(docs, max_docs, min_chars):
    """Pure-Python mirror of remove_boilerplate_lines.
    docs = {id: text}."""
    from collections import Counter

    freq = Counter()
    for text in docs.values():
        keys = {
            ln.strip()
            for ln in text.split("\n")
            if len(ln.strip()) >= min_chars
        }
        freq.update(keys)
    bad = {k for k, n in freq.items() if n > max_docs}
    out = {}
    for i, text in docs.items():
        kept = [
            ln
            for ln in text.split("\n")
            if not (len(ln.strip()) >= min_chars and ln.strip() in bad)
        ]
        if kept:
            out[i] = "\n".join(kept)
    return out


@_HYGIENE_FAST
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=200), _doc, min_size=1, max_size=25
    ),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=12),
)
@pytest.mark.slow
def test_boilerplate_property_matches_python(spark, docs, max_docs, min_chars):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            df, max_docs=max_docs, min_chars=min_chars
        ).collect()
    }
    assert got == _py_boilerplate(docs, max_docs, min_chars)


def _py_contamination(corpus, evals, ngram):
    """Pure-Python mirror of contamination_scan (no thresholds)."""
    import re

    def grams(text):
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        toks = [t for t in toks if t != ""]
        return {
            " ".join(toks[i : i + ngram])
            for i in range(len(toks) - ngram + 1)
        }

    ev = {i: grams(t) for i, t in evals.items()}
    out = {}
    for ci, ct in corpus.items():
        cg = grams(ct)
        for ei, eg in ev.items():
            m = len(cg & eg)
            if m and eg:
                out[(ci, ei)] = (m, len(eg), m / len(eg))
    return out


@_HYGIENE_FAST
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=100),
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=15,
    ),
    st.dictionaries(
        st.integers(min_value=200, max_value=250),
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
        min_size=1, max_size=5,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_contamination_property_matches_python(spark, corpus, evals, ngram):
    cdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        list(evals.items()), "doc_id long, text string"
    )
    got = {
        (r["corpus_id"], r["eval_id"]): (r["n_matched"], r["n_eval"])
        for r in contamination_scan(cdf, edf, ngram=ngram).collect()
    }
    want = {k: (m, ne) for k, (m, ne, _) in
            _py_contamination(corpus, evals, ngram).items()}
    assert got == want


def test_contamination_scan_multi_row_eval_ids_count_once(spark):
    """Eval sets stored as several rows per id (prompt + answer) must
    not double-count shared n-grams in n_eval/n_matched."""
    from goodtables_pandas_py_spark.extensions.decontam import contamination_scan

    text = "alpha beta gamma delta"
    ev_split = spark.createDataFrame(
        [("q1", text), ("q1", text)], "doc_id string, text string"
    )
    ev_one = ev_split.limit(1)
    corpus = spark.createDataFrame([("c1", text)], "doc_id string, text string")
    r_split = contamination_scan(corpus, ev_split, ngram=3).first()
    r_one = contamination_scan(corpus, ev_one, ngram=3).first()
    assert (r_split["n_eval"], r_split["n_matched"], r_split["ratio"]) == (
        r_one["n_eval"], r_one["n_matched"], r_one["ratio"])


def test_near_contamination_catches_paraphrase_exact_misses(spark):
    """Fuzzy decontam (r9): a lightly-edited benchmark copy (one word
    swapped mid-sentence) evades an exact 8-gram containment check
    but is caught by shingle-Jaccard; precision is exact-verified
    (an unrelated doc sharing a few shingles is NOT flagged); and the
    flagged pair's jaccard matches a direct recomputation."""
    from goodtables_pandas_py_spark.extensions.decontam import (
        contaminated_ids,
        near_contaminated_ids,
        near_contamination_scan,
    )

    eval_text = (
        "the quick brown fox jumps over the lazy dog while the "
        "cat watches from the warm windowsill in the evening sun"
    )
    # swap one word in the middle: exact 8-grams straddling it die
    near_copy = eval_text.replace("watches", "stares")
    corpus = spark.createDataFrame(
        [
            (1, near_copy),
            (2, "completely different text about spark query planning "
                "and shuffle exchanges in distributed execution"),
            (3, "the quick brown fox appears here too but the rest "
                "diverges entirely into other unrelated topics now"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )

    exact = {
        r["corpus_id"]
        for r in contaminated_ids(
            corpus, evals, min_ratio=0.8, ngram=8
        ).collect()
    }
    assert 1 not in exact  # the paraphrase evades exact containment

    fuzzy = {
        r["corpus_id"]
        for r in near_contaminated_ids(
            corpus, evals, threshold=0.6, num_hashes=64, num_bands=32
        ).collect()
    }
    assert fuzzy == {1}

    scan = near_contamination_scan(
        corpus, evals, threshold=0.0, num_hashes=64, num_bands=32
    ).collect()
    got = {(r["corpus_id"], r["eval_id"]): r["jaccard"] for r in scan}

    def jac(a, b, k=3):
        def sh(t):
            w = t.lower().split()
            return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
        A, B = sh(a), sh(b)
        return len(A & B) / len(A | B)

    assert abs(got[(1, 100)] - jac(near_copy, eval_text)) < 1e-9


def test_near_contamination_plan_broadcasts_eval_side(spark, sf_dir):
    """The corpus side must never shuffle: candidate join and verify
    join are broadcasts of the (small) eval side; no SortMergeJoin,
    no nested loop."""
    from tests.conftest import load

    from goodtables_pandas_py_spark.extensions.decontam import (
        near_contamination_scan,
    )

    corpus = load(spark, sf_dir, "documents").select("doc_id", "text")
    evals = corpus.where(F.col("doc_id") < 5)
    out = near_contamination_scan(corpus, evals, threshold=0.5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_near_contamination_fallback_guard_same_result(spark, sf_dir):
    """VERDICT r9 item 4: the counted broadcast-cap guard exercised
    synthetically — with the cap forced to 0 the verify joins fall
    back to shuffle joins, which must change ONLY the plan (no
    broadcast of the candidate set), never the result set. The
    unpersist helper releases the internal candidate cache on both
    paths."""
    from tests.conftest import load

    from goodtables_pandas_py_spark.cacheutil import unpersist_scan_state
    from goodtables_pandas_py_spark.extensions.decontam import (
        near_contamination_scan,
    )

    corpus = load(spark, sf_dir, "documents").select("doc_id", "text")
    evals = corpus.where(F.col("doc_id") % 40 == 0)

    def run(cap):
        scan = near_contamination_scan(
            corpus, evals, threshold=0.5,
            max_broadcast_candidates=cap,
        )
        rows = sorted(
            (r["corpus_id"], r["eval_id"], round(r["jaccard"], 9))
            for r in scan.collect()
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert unpersist_scan_state(scan) == 1
        return rows, plan

    broadcast_rows, _ = run(5_000_000)
    fallback_rows, fplan = run(0)
    assert broadcast_rows == fallback_rows
    assert len(broadcast_rows) >= len(evals.collect())  # self-pairs
    # the fallback must still never plan a nested loop
    assert "Cartesian" not in fplan
    assert "BroadcastNestedLoopJoin" not in fplan
