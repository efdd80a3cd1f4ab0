"""Text-analysis operators (X4): token counting, quality scoring,
language ID, document fingerprinting — all JVM-side Column expressions
(no Python in the hot path), designed for 100 TB document tables.

The reference has no text analytics; these extend its vectorized
philosophy ([R parse.py] whole-column kernels) to LLM-data-pipeline
needs (SURVEY.md §2.9).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- tokenization ---------------------------------------------------------

#: BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs —
#: the shape GPT-style BPE pre-tokenization produces (public pattern
#: family; simplified, ASCII-oriented).
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def whitespace_tokens(text: Column) -> Column:
    """Split on whitespace runs; empty input -> empty array."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column, method: str = "whitespace") -> Column:
    """Token count; 'whitespace' or 'bpe' (regexp-based BPE-ish
    pre-tokenization)."""
    if method == "whitespace":
        return F.size(whitespace_tokens(text))
    if method == "bpe":
        return F.coalesce(F.regexp_count(text, F.lit(BPE_TOKEN_RE)), F.lit(0))
    raise ValueError(f"unknown tokenizer {method!r}")


# --- quality scoring ------------------------------------------------------

#: small English stopword list (public, standard)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
]


def quality_features(text: Column) -> Column:
    """Struct of cheap quality signals: length, token count, mean word
    length, punctuation ratio, stopword ratio, uppercase ratio. All
    whole-stage-codegen expressions."""
    toks = whitespace_tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    # stopword occurrences: match case-insensitively with edge
    # punctuation stripped ("The" / "the," are stopword hits — raw
    # token matching systematically undercounted prose)
    n_stop = F.size(F.filter(
        toks,
        lambda t: F.lower(
            F.regexp_replace(t, r"^[^A-Za-z]+|[^A-Za-z]+$", "")
        ).isin(*EN_STOPWORDS),
    ))
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    # Gopher mean word length = mean TOKEN length: whitespace must
    # not count (total-length/n_tok inflated it by ~1 char/word).
    # Non-whitespace chars == sum of token lengths under the ASCII-\s
    # tokenizer contract, and stays whole-stage codegen.
    n_tok_chars = F.length(
        F.regexp_replace(text, r"[ \t\n\x0B\f\r]", "")
    )
    return F.struct(
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (n_tok_chars / safe_tok).alias("mean_word_len"),
        (n_punct / safe_chars).alias("punct_ratio"),
        (n_stop / safe_tok).alias("stopword_ratio"),
        (n_upper / safe_chars).alias("upper_ratio"),
    )


def quality_score(text: Column) -> Column:
    """Scalar [0,1] quality heuristic: penalize extreme lengths, high
    punctuation, low stopword incidence (Gopher-rule-style signals,
    public C4/Gopher filtering heuristics)."""
    q = quality_features(text)
    len_ok = (q["n_tokens"] >= 5) & (q["n_tokens"] <= 100000)
    word_ok = (q["mean_word_len"] >= 2) & (q["mean_word_len"] <= 15)
    punct_ok = q["punct_ratio"] <= 0.3
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(word_ok, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ok, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.least(q["stopword_ratio"] * 2, F.lit(0.1))
    )
    return score.alias("quality_score")


# --- unigram LM scoring (CCNet-style) --------------------------------------


def token_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus unigram table ``(token STRING, n BIGINT)``: whitespace
    tokens (lowercased by default), occurrence counts. One explode +
    one groupBy with map-side combine — the shuffle carries one row
    per DISTINCT token per partition, not per occurrence."""
    t = F.col(text_col)
    toks = whitespace_tokens(F.lower(t) if lowercase else t)
    # explode_outer + null filter: plain explode makes the optimizer
    # infer a size(...)>0 filter that re-evaluates the tokenization
    # per row (see spans.window_hashes); a real token is never null
    return (
        df.select(F.explode_outer(toks).alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def unigram_logprob(
    df: DataFrame,
    freqs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    head_vocab: int = 100_000,
) -> DataFrame:
    """Per-document unigram cross-entropy — the language-model
    quality signal of CCNet (Wenzek et al., arXiv:1911.00359, which
    scores with a KenLM 5-gram and buckets the corpus into
    head/middle/tail by perplexity; this is the unigram proxy a
    Spark-native pipeline can train ON THE CORPUS ITSELF in one
    pass). Low cross-entropy = repetitive/common-word text; high =
    rare-token soup; both tails are filter candidates.

    Returns ``(id_col, n_tokens BIGINT, xent_milli BIGINT, xent
    DOUBLE)`` where each token contributes
    ``round((ln(N) - ln(c)) * 1000)`` milli-nats (c = corpus count of
    the token, N = total tokens) to ``xent_milli``, and
    ``xent = xent_milli / 1000 / n_tokens`` is mean nats/token.
    Summing INTEGER milli-nats makes the result exactly reproducible
    across engines and partitionings (float sums are
    order-dependent); the 0.0005 nats/token max quantization error is
    noise at filtering scale. Documents with zero tokens surface with
    ``n_tokens = 0`` and null scores.

    ``freqs`` defaults to :func:`token_frequencies` over ``df``
    itself (self-scoring — no OOV by construction). Pass a frequency
    table trained on a clean reference corpus for CCNet's actual
    shape (score crawl text against Wikipedia-ish counts); tokens
    absent from it score as count 1 (maximum surprise).

    Scale shape — the token join is Zipf-skewed by nature ("the"
    matches millions of exploded rows), so it runs as a TWO-PATH
    join: the ``head_vocab`` most frequent tokens resolve through a
    broadcast map-side join (no shuffle, no skew — the head IS the
    skew), and only the miss rows (rare-token occurrences, near-
    uniform by construction) take the shuffled join against the full
    frequency table. One final groupBy(id) rolls up per-doc sums."""
    from ..cacheutil import attach_persisted

    t = F.col(text_col)
    toks = whitespace_tokens(F.lower(t) if lowercase else t)
    held = []
    if freqs is None:
        # persist: the table is consumed three times (total collect,
        # head limit, tail join); un-persisted each consumer would
        # re-run the full explode-every-token fit scan (review r5)
        freqs = token_frequencies(df, text_col, lowercase).persist()
        held.append(freqs)
    freqs = freqs.select("token", F.col("n").cast("bigint").alias("n"))
    total = freqs.agg(F.sum("n")).collect()[0][0] or 1  # one scalar
    ln_total = F.log(F.lit(float(total)))
    # persist the exploded corpus: _two_path_join consumes it in BOTH
    # its hits and misses branches, so without this the dominant
    # tokenize+explode scan ran twice per action (r10 review fix —
    # bigram_logprob already persisted each _two_path_join input);
    # lifetime rides on the returned frame (cacheutil contract)
    exploded = (
        df.select(F.col(id_col), F.explode_outer(toks).alias("token"))
        .where(F.col("token").isNotNull())
        .persist()
    )
    held.append(exploded)
    rows = _two_path_join(exploded, freqs, ["token"], "n", head_vocab)
    milli = F.floor(
        (ln_total - F.log(F.coalesce(F.col("n"), F.lit(1)).cast("double")))
        * 1000
        + F.lit(0.5)
    ).cast("bigint")
    scored = rows.select(id_col, milli.alias("__m"))
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__m").cast("bigint").alias("xent_milli"),
    )
    # docs with zero tokens (empty/null text) have no exploded rows
    all_ids = df.select(id_col).distinct()
    out = all_ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias(
            "n_tokens"
        ),
        "xent_milli",
    )
    return attach_persisted(
        out.withColumn(
            "xent",
            F.when(
                F.col("n_tokens") > 0,
                F.col("xent_milli") / 1000.0 / F.col("n_tokens"),
            ),
        ),
        *held,
    )


def bigram_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus bigram table ``(prev STRING, cur STRING, n BIGINT)``
    over lowercased whitespace tokens — one explode of per-row
    adjacent pairs + a map-side-combined count."""
    pairs = _token_pairs(df, "__ignored_id", text_col, lowercase)
    return (
        pairs.where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _token_pairs(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool
) -> DataFrame:
    """One row per token with its predecessor:
    ``(id_col?, prev STRING|null, cur STRING)`` — prev is null for
    each document's first token. Pairs are built with zip_with over a
    null-prefixed shifted slice (operands evaluate once per row — the
    slice-inside-lambda form is the O(n²) trap, review r5), exploded
    with explode_outer + a generated-column filter (the inferred
    size()>0 filter for plain explode re-evaluates the pair building
    per row — see spans.window_hashes)."""
    t = F.col(text_col)
    toks = whitespace_tokens(F.lower(t) if lowercase else t)
    sz = F.size(toks)
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(toks, 1, F.greatest(sz - 1, F.lit(0))),
    )
    pairs = F.when(
        sz > 0,
        F.zip_with(
            prevs,
            toks,
            lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
        ),
    )
    cols = [F.col(id_col)] if id_col in df.columns else []
    return (
        df.select(*cols, F.explode_outer(pairs).alias("__pr"))
        .where(F.col("__pr.cur").isNotNull())
        .select(
            *[c for c in ([id_col] if id_col in df.columns else [])],
            F.col("__pr.prev").alias("prev"),
            F.col("__pr.cur").alias("cur"),
        )
    )


def _two_path_join(
    rows: DataFrame,
    table: DataFrame,
    keys: list[str],
    val_col: str,
    head_size: int,
) -> DataFrame:
    """Zipf-skew-immune left join of ``rows`` against a count
    ``table``: the ``head_size`` highest-count keys join via a
    broadcast map-side pass (the head IS the skew), only the miss
    rows — rare keys, near-uniform by construction — take the
    shuffled join. Null join keys fall through both paths to a null
    ``val_col``.

    PRECONDITION: ``table`` must be unique on ``keys`` (true for
    every table produced by :func:`unigram_counts` /
    :func:`bigram_counts`, which groupBy the keys). A caller passing
    a non-aggregated or unioned count table would duplicate exploded
    rows in both paths and silently inflate n_tokens / xent_milli —
    aggregate by key first (advisor r5)."""
    head = table.orderBy(F.col(val_col).desc(), *keys).limit(head_size)
    j = rows.join(F.broadcast(head), keys, "left")
    hits = j.where(F.col(val_col).isNotNull())
    misses = j.where(F.col(val_col).isNull()).drop(val_col).join(
        table, keys, "left"
    )
    return hits.unionByName(misses)


def bigram_logprob(
    df: DataFrame,
    uni_counts: DataFrame | None = None,
    bi_counts: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    head_vocab: int = 100_000,
    backoff: float = 0.4,
    persist: bool = True,
) -> DataFrame:
    """Per-document BIGRAM cross-entropy with stupid backoff (Brants
    et al. 2007, "Large Language Models in Machine Translation") —
    the conditional-LM upgrade of :func:`unigram_logprob`, one order
    closer to CCNet's KenLM signal. Each document's first token
    scores its unigram probability ``c(w)/N``; every later token
    scores ``c(prev,cur)/c(prev)`` when the bigram was seen, else
    ``backoff * c(cur)/N``. Output contract matches
    :func:`unigram_logprob`: ``(id_col, n_tokens BIGINT, xent_milli
    BIGINT, xent DOUBLE)`` with exact integer milli-nat sums
    (bit-stable across engines and partitionings).

    ``uni_counts`` / ``bi_counts`` default to self-training on ``df``
    (where the backoff branch is dead by construction — every
    adjacent pair was counted); pass tables fitted on a reference
    corpus for the CCNet shape, and unseen bigrams then back off.

    Scale shape: every :func:`_two_path_join` consumes its input
    TWICE (hits + misses), so chaining them naively doubles the
    upstream plan per level — 2³ replays of the pair explode
    (measured: 47 Generate nodes in one plan, review r5). Each stage
    input is therefore persisted (``persist=False`` opts out when the
    caller wraps the call in its own persist scope), and document
    FIRST tokens (prev = null) are routed AROUND the prev/bigram
    joins entirely — they are scored by the unigram branch alone, and
    shipping them through would both be wasted work and hash every
    null key to one straggler reducer. The persisted frames are the
    lean pair/count projections, ATTACHED to the returned frame (r10,
    cacheutil contract): long-lived loops scoring many corpora call
    ``unpersist_scan_state(result)`` after materializing; callers
    that don't merely fall back to Spark's LRU.

    Model-consistency guard: a token whose BIGRAM is in ``bi_counts``
    but whose predecessor is missing from ``uni_counts`` (possible
    only with externally supplied, mutually inconsistent tables)
    scores through the BACKOFF branch rather than poisoning the sum
    with a null (which F.sum would silently skip, underreporting
    xent — review r5)."""
    if uni_counts is None:
        uni_counts = token_frequencies(df, text_col, lowercase)
    if bi_counts is None:
        bi_counts = bigram_counts(df, text_col, lowercase)
    from ..cacheutil import attach_persisted

    held = []
    uni = uni_counts.select("token", F.col("n").cast("bigint").alias("n"))
    bi = bi_counts.select(
        "prev", "cur", F.col("n").cast("bigint").alias("n")
    )
    if persist:
        uni, bi = uni.persist(), bi.persist()
        held += [uni, bi]
    total = uni.agg(F.sum("n")).collect()[0][0] or 1
    ln_total = F.log(F.lit(float(total)))
    ln_backoff = -math.log(backoff)

    pairs = _token_pairs(df, id_col, text_col, lowercase)
    if persist:
        pairs = pairs.persist()
        held.append(pairs)
    r1 = _two_path_join(
        pairs,
        uni.select(F.col("token").alias("cur"), F.col("n").alias("__n1c")),
        ["cur"],
        "__n1c",
        head_vocab,
    )
    if persist:
        r1 = r1.persist()
        held.append(r1)
    ln_n1c = F.log(F.coalesce(F.col("__n1c"), F.lit(1)).cast("double"))
    uni_milli = F.floor((ln_total - ln_n1c) * 1000 + F.lit(0.5))
    backoff_milli = F.floor(
        (ln_total - ln_n1c + F.lit(ln_backoff)) * 1000 + F.lit(0.5)
    )
    firsts = r1.where(F.col("prev").isNull()).select(
        F.col(id_col), uni_milli.cast("bigint").alias("__m")
    )
    rest = r1.where(F.col("prev").isNotNull())
    r2 = _two_path_join(
        rest,
        uni.select(F.col("token").alias("prev"), F.col("n").alias("__n1p")),
        ["prev"],
        "__n1p",
        head_vocab,
    )
    if persist:
        r2 = r2.persist()
        held.append(r2)
    r3 = _two_path_join(
        r2,
        bi.select("prev", "cur", F.col("n").alias("__n2")),
        ["prev", "cur"],
        "__n2",
        head_vocab,
    )
    cond_milli = (
        F.when(
            F.col("__n2").isNotNull() & F.col("__n1p").isNotNull(),
            F.floor(
                (
                    F.log(F.col("__n1p").cast("double"))
                    - F.log(F.col("__n2").cast("double"))
                )
                * 1000
                + F.lit(0.5)
            ),
        )
        .otherwise(backoff_milli)
        .cast("bigint")
    )
    scored = firsts.unionByName(
        r3.select(F.col(id_col), cond_milli.alias("__m"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__m").cast("bigint").alias("xent_milli"),
    )
    out = (
        df.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias(
                "n_tokens"
            ),
            "xent_milli",
        )
    )
    return attach_persisted(
        out.withColumn(
            "xent",
            F.when(
                F.col("n_tokens") > 0,
                F.col("xent_milli") / 1000.0 / F.col("n_tokens"),
            ),
        ),
        *held,
    )


# --- language ID ----------------------------------------------------------

#: tiny per-language function-word profiles (public knowledge); the
#: heuristic votes by profile-word hits — deterministic, JVM-side.
_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}


def lang_id(text: Column) -> Column:
    """Heuristic language ID over profile-word hits; returns the
    best-scoring language code or 'und'.

    Scores are commensurate across scripts — each is a coverage ratio
    in [0, 1]: Latin languages score profile-word *occurrences per
    token*; zh scores profile-character occurrences *per character*
    (no whitespace tokenization assumption). Raw counts would bias
    mixed CJK/Latin text toward zh (character hits are unbounded while
    distinct word types cap at the profile size). Ties break toward
    the max language code (struct comparison), same as the oracle."""
    toks = whitespace_tokens(F.lower(text))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chr = F.greatest(F.length(text), F.lit(1))
    scores = []
    for lang, words in _LANG_PROFILES.items():
        if lang == "zh":
            hits = sum(
                (F.length(text) - F.length(F.replace(text, F.lit(w), F.lit(""))))
                for w in words
            )
            score = hits.cast("double") / n_chr
        else:
            hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
            score = hits.cast("double") / n_tok
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


# --- fingerprinting -------------------------------------------------------


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, strip edges."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def shingles(tokens: Column, k: int = 3) -> Column:
    """k-word shingles of a token array, JVM-side:
    transform(sequence(0, n-k), i -> concat_ws(' ', slice(tokens, i+1, k))).
    Returns empty array when n < k."""
    n = F.size(tokens)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
        )
    )


def rolling_fingerprint(text: Column, k: int = 3) -> Column:
    """Content-defined fingerprint: min xxhash64 over k-word shingles
    of the normalized text (minhash with one permutation) — stable
    under small edits far from the minimum. Null-safe: short docs fall
    back to the md5 fingerprint hashed to long."""
    toks = whitespace_tokens(normalize_text(text))
    sh = shingles(toks, k)
    min_h = F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
    return F.coalesce(min_h, F.xxhash64(normalize_text(text)))


# --- convenience over a documents table -----------------------------------


def analyze_documents(
    df: DataFrame, text_col: str = "text", tokenizer: str = "whitespace"
) -> DataFrame:
    """One-scan text profile of a documents table: adds token counts,
    quality features, langid, fingerprints. Single projection —
    explain() shows one WholeStageCodegen span over the scan."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t, tokenizer).alias("n_tokens"),
        token_count(t, "bpe").alias("n_bpe_tokens"),
        quality_features(t).alias("quality"),
        quality_score(t).alias("quality_score"),
        repetition_features(t).alias("repetition"),
        lang_id(t).alias("lang_pred"),
        fingerprint_md5(t).alias("fp_md5"),
        rolling_fingerprint(t).alias("fp_rolling"),
    )


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 15.0,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float | None = None,
    allowed_langs: list[str] | None = None,
    max_dup_line_frac: float | None = None,
    max_dup_line_char_frac: float | None = None,
    max_top_2gram_char_frac: float | None = None,
    max_top_3gram_char_frac: float | None = None,
    with_reasons: bool = False,
) -> DataFrame:
    """C4/Gopher-style corpus cleaning in ONE scan: compose the text
    signals into a keep/drop decision per document (public filtering
    heuristics: C4's length/punctuation rules, Gopher's mean-word-
    length and stopword-incidence rules).

    Returns the KEPT rows (schema unchanged); ``with_reasons=True``
    instead returns every row plus ``keep: boolean`` and
    ``drop_reasons: array<string>`` — the audit shape: write it
    partitioned by a reason and you can answer "what did the length
    rule cost us" without re-running the filter.

    Scale shape: pure Column algebra over one projection — no
    shuffle, no UDF, whole-stage codegen end-to-end; at 100 TB this
    is a map-only job that reads exactly ``text_col`` (column
    pruning) and filters as it scans. Rule thresholds are plan-time
    literals so Catalyst folds the comparisons.

    ``min_stopword_ratio`` defaults off because it is an
    ENGLISH-ONLY signal — enable it together with
    ``allowed_langs=["en"]``; a corpus-wide stopword floor silently
    drops every non-English document.

    The ``max_dup_*`` / ``max_top_*`` thresholds enable Gopher's
    WITHIN-document repetition rules (:func:`repetition_features`,
    computed to Gopher's definitions so its published ranges apply
    directly) — e.g. ``max_dup_line_frac=0.30,
    max_dup_line_char_frac=0.20, max_top_2gram_char_frac=0.20,
    max_top_3gram_char_frac=0.18``. Off by default: they add array
    ops per document, and thresholds deserve corpus-level review."""
    t = F.col(text_col)
    q = quality_features(t)
    rules: list[tuple[str, Column]] = [
        ("too_few_tokens", q["n_tokens"] < min_tokens),
        ("too_many_tokens", q["n_tokens"] > max_tokens),
        ("mean_word_too_short", q["mean_word_len"] < min_mean_word_len),
        ("mean_word_too_long", q["mean_word_len"] > max_mean_word_len),
        ("too_much_punct", q["punct_ratio"] > max_punct_ratio),
    ]
    if min_stopword_ratio is not None:
        rules.append(
            ("too_few_stopwords", q["stopword_ratio"] < min_stopword_ratio)
        )
    if allowed_langs is not None:
        rules.append(
            ("lang_not_allowed", ~lang_id(t).isin(*allowed_langs))
        )
    rep_rules = [
        ("too_many_dup_lines", "dup_line_frac", max_dup_line_frac),
        ("too_many_dup_line_chars", "dup_line_char_frac",
         max_dup_line_char_frac),
        ("top_2gram_too_dominant", "top_2gram_char_frac",
         max_top_2gram_char_frac),
        ("top_3gram_too_dominant", "top_3gram_char_frac",
         max_top_3gram_char_frac),
    ]
    if any(thresh is not None for _, _, thresh in rep_rules):
        rep = repetition_features(t)
        for name, field, thresh in rep_rules:
            if thresh is not None:
                rules.append((name, rep[field] > thresh))
    # null text fails closed: every rule comparison is null on null
    # input, so fold the null case into an explicit reason
    rules = [(name, F.coalesce(cond, t.isNull())) for name, cond in rules]
    reasons = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)) for name, cond in rules]
        ),
        lambda x: x.isNotNull(),
    )
    if with_reasons:
        return df.select(
            "*",
            (F.size(reasons) == 0).alias("keep"),
            reasons.alias("drop_reasons"),
        )
    keep = None
    for _, cond in rules:
        keep = ~cond if keep is None else (keep & ~cond)
    return df.where(keep if keep is not None else F.lit(True))


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 10,
    min_chars: int = 6,
) -> DataFrame:
    """C4-style cross-document line deduplication: a line whose
    trimmed form appears in MORE than ``max_docs`` distinct documents
    is boilerplate (nav bars, cookie banners, license headers) and is
    removed from EVERY document; each document's remaining lines are
    reassembled in their original order into ``text_col``. Lines
    shorter than ``min_chars`` never count (blank lines, lone braces —
    ubiquitous but not boilerplate evidence) and are always kept.

    Scale shape, in four stages:

    1. candidate discovery — explode lines, DISTINCT (xxhash64(line),
       doc) pairs (map-side combine collapses within-doc repeats),
       count docs per line HASH: the shuffle carries 16 B per distinct
       pair instead of the line text. Hash collisions can only
       OVERCOUNT (two lines sharing a hash pool their doc counts), so
       the candidate set is a superset of the true offenders — never
       a miss;
    2. exact verification — re-count docs per line STRING, restricted
       (broadcast semi-join on the hash) to candidate lines only: the
       full-text shuffle now carries boilerplate-frequency lines plus
       the odd collision, not the corpus. Output equality is decided
       on strings, so a collision costs shuffle bytes, never a wrongly
       removed line (the byte-exact contract the x4_hygiene oracle
       pins);
    3. filter — broadcast anti-join of the exploded lines against the
       (small, by definition: boilerplate is the head of the line
       frequency distribution) exact offender set — map-side, no
       corpus shuffle;
    4. reassembly — groupBy(id) + order-preserving array_sort on
       (pos, line) structs: the one remaining full-text shuffle. For
       inputs bucketed/pre-partitioned by ``id_col``
       (sources.write_bucketed) this stage is shuffle-free.

    A document consisting ENTIRELY of removed lines is itself dropped
    (it was pure boilerplate); documents keeping any line — including
    blank/short ones — survive with the removed lines stripped.
    Deterministic; no UDFs anywhere.
    """
    if max_docs <= 0:
        raise ValueError("max_docs must be positive")
    others = [c for c in df.columns if c != text_col]
    # NULL text passes through untouched: the old coalesce(text,'')
    # silently rewrote null docs to empty STRING through the
    # explode/rebuild, erasing the null-vs-empty distinction
    # downstream hygiene rules depend on (r10 review fix)
    null_rows = df.where(F.col(text_col).isNull())
    lines = df.where(F.col(text_col).isNotNull()).select(
        *others,
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__pos", "__line"
        ),
    )
    # whitespace-trimmed match key (regex trim: F.trim strips only
    # ASCII spaces, which would make the same banner line mismatch
    # between LF and CRLF documents via a trailing '\r'); the raw
    # __line is what reassembles, so output bytes are untouched
    key = F.regexp_replace(F.col("__line"), r"^\s+|\s+$", "")
    eligible = lines.where(F.length(key) >= min_chars)
    cand_hashes = (
        eligible.select(
            F.xxhash64(key).alias("__kh"), F.col(id_col).alias("__oid")
        )
        .distinct()
        .groupBy("__kh")
        .agg(F.count(F.lit(1)).alias("__n_docs"))
        .where(F.col("__n_docs") > max_docs)
        .select("__kh")
    )
    offenders = (
        eligible.join(
            F.broadcast(cand_hashes), F.xxhash64(key) == F.col("__kh"),
            "left_semi",
        )
        .select(key.alias("__key"), F.col(id_col).alias("__oid"))
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__n_docs"))
        .where(F.col("__n_docs") > max_docs)
        .select("__key")
    )
    kept = lines.join(
        F.broadcast(offenders),
        (key == F.col("__key")) & (F.length(key) >= min_chars),
        "left_anti",
    )
    rebuilt = kept.groupBy(*others).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(text_col)
    )
    return rebuilt.select(*df.columns).unionByName(
        null_rows.select(*df.columns)
    )


# --- PII scrubbing --------------------------------------------------------

#: conservative, RE2-compatible (no lookaround/backrefs) patterns so
#: the SAME regex runs in Spark (Java regex), DuckDB (RE2), and Python
#: — redaction must be reproducible across engines, like hash_split.
#: Unanchored variants of the patterns.py format regexes where one
#: exists.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b",
    "phone": r"\+?[0-9][0-9()\-\. ]{6,}[0-9]\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b(?:[0-9][ -]?){15}[0-9]\b",
}

#: redaction order matters: wider/more-specific patterns first so e.g.
#: a credit card is not half-eaten by the phone pattern.
PII_ORDER = ["email", "credit_card", "ssn", "ipv4", "phone"]


def redact_pii(
    text: Column,
    kinds: list[str] | None = None,
    token: str = "<{kind}>",
) -> Column:
    """Replace PII spans with ``token`` (``{kind}`` substituted):
    chained ``regexp_replace`` — map-only, codegen, no UDF, and
    engine-reproducible because every pattern is RE2-compatible.
    These are pattern heuristics (the public-corpus standard), NOT a
    guarantee: format-free PII (names, addresses) needs an NER pass,
    which belongs behind the multimodal-style pluggable UDF surface.
    """
    order = [k for k in PII_ORDER if kinds is None or k in kinds]
    unknown = set(kinds or []) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = text
    for kind in order:
        out = F.regexp_replace(
            out, PII_PATTERNS[kind], token.format(kind=kind)
        )
    return out


def pii_counts(text: Column, kinds: list[str] | None = None) -> Column:
    """Struct of per-kind PII match counts (``regexp_count`` — one
    scan, all kinds): the audit/reporting twin of :func:`redact_pii`.
    Counts are taken on the SAME text independently per kind, so
    overlapping patterns (a credit card that also matches the phone
    shape) count under each kind they match."""
    order = [k for k in PII_ORDER if kinds is None or k in kinds]
    unknown = set(kinds or []) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    return F.struct(
        *[
            F.coalesce(
                F.regexp_count(text, F.lit(PII_PATTERNS[k])), F.lit(0)
            ).alias(k)
            for k in order
        ]
    )


# --- intra-document repetition (Gopher repetition rules) ------------------


def _sorted_run_stats(sorted_arr: Column) -> Column:
    """Over a SORTED string array, one fold computing
    struct(dup_n, dup_chars, top_chars):

    - ``dup_n``     — total occurrences of items appearing > 1 time
      (ALL occurrences, the Gopher counting convention);
    - ``dup_chars`` — characters across those occurrences;
    - ``top_chars`` — count × length of the MOST FREQUENT item
      (Gopher's top-n-gram is selected by frequency; ties break
      toward the larger character mass so the result is
      order-independent).

    Equal items are adjacent after array_sort, so duplicate runs fall
    out of a linear scan — no per-item grouping needed."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup_n"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("top_run"),
        F.lit(0).cast("long").alias("top_chars"),
    )

    def step(acc: Column, g: Column) -> Column:
        same = acc["prev"].isNotNull() & (g == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        flush = (~same) & (acc["run"] > 1)  # a duplicate run just ended
        dup_n = acc["dup_n"] + F.when(flush, acc["run"]).otherwise(0)
        dup_chars = acc["dup_chars"] + F.when(
            flush, acc["run"] * F.length(acc["prev"])
        ).otherwise(0)
        chars = run * F.length(g)
        better = (run > acc["top_run"]) | (
            (run == acc["top_run"]) & (chars > acc["top_chars"])
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            dup_n.alias("dup_n"),
            dup_chars.alias("dup_chars"),
            F.when(better, run).otherwise(acc["top_run"]).alias("top_run"),
            F.when(better, chars).otherwise(acc["top_chars"]).alias(
                "top_chars"
            ),
        )

    def finish(acc: Column) -> Column:
        last = acc["run"] > 1
        return F.struct(
            (acc["dup_n"] + F.when(last, acc["run"]).otherwise(0)).alias(
                "dup_n"
            ),
            (
                acc["dup_chars"]
                + F.when(last, acc["run"] * F.length(acc["prev"])).otherwise(0)
            ).alias("dup_chars"),
            acc["top_chars"].alias("top_chars"),
        )

    return F.aggregate(sorted_arr, init, step, finish)


def repetition_features(text: Column) -> Column:
    """Struct of Gopher WITHIN-document repetition signals — the
    complement of the cross-document filters (near-dup, boilerplate):
    a single spammy page repeating one paragraph 50 times is unique
    corpus-wide yet worthless. All pure Column algebra over array ops
    (no shuffle, no UDF), computed to GOPHER'S definitions so its
    published thresholds calibrate directly:

    - ``dup_line_frac``       — fraction of non-blank lines that
      belong to a duplicated line (ALL occurrences counted — Gopher's
      convention; its published range is ~0.30);
    - ``dup_line_char_frac``  — fraction of non-blank-line CHARACTERS
      inside duplicated lines (~0.20);
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac`` — fraction of
      normalized-text characters covered by all occurrences of the
      single most frequent word 2-/3-gram (count × gram length /
      text length; Gopher's top-n-gram rule, ~0.20 / ~0.18).

    Lines split on ``\\r?\\n`` and blank means whitespace-only (a
    CRLF or tab-indented blank line is NOT a duplicated line).
    Empty/short inputs yield 0.0 for every signal."""
    raw_lines = F.split(F.coalesce(text, F.lit("")), r"\r?\n")
    lines = F.filter(
        F.transform(
            raw_lines,
            lambda ln: F.regexp_replace(ln, r"^\s+|\s+$", ""),
        ),
        lambda ln: ln != "",
    )
    n_lines = F.size(lines)
    line_stats = _sorted_run_stats(F.array_sort(lines))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"),
        lambda acc, ln: acc + F.length(ln),
    )
    dup_line_frac = F.when(
        n_lines > 0, line_stats["dup_n"] / n_lines
    ).otherwise(F.lit(0.0))
    dup_line_char_frac = F.when(
        total_chars > 0, line_stats["dup_chars"] / total_chars
    ).otherwise(F.lit(0.0))

    normed = normalize_text(text)
    toks = whitespace_tokens(normed)
    n_chars = F.greatest(F.length(F.coalesce(normed, F.lit(""))), F.lit(1))

    def top_ngram_char_frac(k: int) -> Column:
        sh = shingles(toks, k)
        return F.when(
            F.size(sh) > 0,
            _sorted_run_stats(F.array_sort(sh))["top_chars"] / n_chars,
        ).otherwise(F.lit(0.0))

    return F.struct(
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        top_ngram_char_frac(2).alias("top_2gram_char_frac"),
        top_ngram_char_frac(3).alias("top_3gram_char_frac"),
    )


# --- document chunking ------------------------------------------------------


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    stride: int | None = None,
) -> DataFrame:
    """Sliding-window WORD chunking: split each document into chunks
    of at most ``max_tokens`` whitespace tokens, windows starting
    every ``stride`` tokens (default ``max_tokens`` — disjoint
    chunks; smaller stride = overlapping windows, the RAG/embedding
    prep shape). Output one row per chunk:
    ``(id_col, chunk_id, chunk_text, n_tokens)`` — ``chunk_id``
    0-based in document order, ``n_tokens`` the chunk's actual token
    count (< max_tokens only for the final window).

    Contrast :func:`~.splits.sequence_offsets`, which packs MANY docs
    end-to-end into fixed-length training sequences; this splits ONE
    doc into windows and never mixes documents.

    Scale shape: pure Column algebra — split once, window starts as a
    ``sequence``, each chunk an ``array_join(slice(...))``, one
    posexplode. Map-only: no shuffle, no UDF; a 1M-token document
    costs memory proportional to its own size times the overlap
    factor (max_tokens/stride), never a driver visit. Trailing
    windows that would start at-or-past the end are not emitted;
    an empty/whitespace-only document yields zero chunks (its token
    array is empty); a null text yields zero chunks (sequence of
    null explodes to nothing)."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    stride = max_tokens if stride is None else stride
    if not 1 <= stride <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens={max_tokens}], got {stride}"
        )
    toks = whitespace_tokens(F.col(text_col))
    n = F.size(toks)
    # last window START: the largest multiple of stride < n (for n>0);
    # also never beyond n - max_tokens rounded UP to a stride multiple
    # — windows past that are suffixes of the previous window
    last_full = F.ceil((n - F.lit(max_tokens)) / F.lit(stride)) * stride
    last_start = F.greatest(
        F.least(last_full, ((n - 1) / F.lit(stride)).cast("long") * stride),
        F.lit(0).cast("long"),
    )
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride).cast("long")),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("__start").cast("int") + 1, max_tokens
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )
