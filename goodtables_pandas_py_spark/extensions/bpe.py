"""Byte-pair-encoding tokenizer: distributed fit summary + driver
merge loop + Arrow-batched encode (X4 text analysis, r6).

Token counting elsewhere in this package is whitespace/regex-based;
LLM data budgets are set in TOKENIZER tokens, which can differ from
whitespace counts by 2-4x on web text. This module learns a real BPE
vocabulary (Sennrich et al. 2016, arXiv:1508.07909 — word-internal
character merges with an end-of-word marker) and encodes/counts with
it.

Scale shape — the part people get wrong:

- **Fit** is NOT an iterative corpus scan. The only distributed work
  is ONE word-count aggregation (explode whitespace tokens →
  groupBy word — a single shuffle whose output is Zipf-bounded);
  the merge loop then runs on the driver over the top ``max_words``
  distinct words (default 50k — on any natural corpus that covers
  >99% of token mass), which is exactly how fast tokenizer trainers
  (HuggingFace, SentencePiece) structure it. At 100 TB the fit cost
  is one agg over the corpus, independent of vocab size.
- **Encode** is embarrassingly parallel: a pandas UDF applies the
  learned merge ranks per word with a per-batch word cache (web text
  repeats words heavily, so amortized cost per token is near the
  dict lookup), Arrow-batched, map-only — no shuffle, no state.

Determinism: merges pick the (count DESC, pair ASC) argmax, so a
re-fit on the same counts is bit-identical anywhere; the encode is a
pure function of (text, merges).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import whitespace_tokens

#: marks word end so merges cannot cross word boundaries and a
#: word-final symbol differs from the same symbol mid-word
EOW = "</w>"


# --------------------------------------------------------------------------
# pure-Python kernels (driver fit / per-batch encode)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Apply one merge to a symbol tuple, leftmost-first,
    non-overlapping (the classic BPE rule: 'aaa' under ('a','a')
    becomes ('aa','a'))."""
    out = []
    i = 0
    n = len(syms)
    merged = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def fit_bpe_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The driver merge loop over a (word, count) summary — pure
    Python, deterministic: each round merges the (count DESC,
    pair ASC) most frequent adjacent symbol pair, weighted by word
    frequency. Returns the ordered merge list (the model)."""
    vocab = {_word_symbols(w): c for w, c in word_counts if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _merge_word(syms, best): c for syms, c in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with the learned merge ranks: repeatedly apply
    the lowest-rank applicable merge (the standard BPE inference
    rule — equivalent to replaying the training merges in order)."""
    syms = _word_symbols(word)
    if not syms:
        return []
    while len(syms) > 1:
        ranked = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        _, best = min(ranked)
        syms = _merge_word(syms, best)
    return list(syms)


# --------------------------------------------------------------------------
# Spark surface


def bpe_word_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 50_000,
) -> list[tuple[str, int]]:
    """The distributed half of the fit: ONE explode → groupBy(word)
    aggregation over the corpus, then the top ``max_words`` rows by
    (count DESC, word ASC) come back to the driver. The ordering tie
    break makes the summary — and therefore the whole fit —
    deterministic across partitionings."""
    t = F.col(text_col)
    toks = whitespace_tokens(F.lower(t) if lowercase else t)
    counts = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], int(r["c"])) for r in counts]


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    lowercase: bool = True,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Fit a BPE merge list on a corpus: distributed word counts +
    driver merge loop (see module docstring for why this is the
    correct 100 TB shape)."""
    return fit_bpe_merges(
        bpe_word_counts(df, text_col, lowercase, max_words), n_merges
    )


def _encode_schema(df: DataFrame, id_col: str) -> T.StructType:
    """Output schema for bpe_encode, carrying the id column through
    under its own name and dtype (string doc ids, int ids, ... all
    round-trip the Arrow boundary unchanged)."""
    id_field = df.schema[id_col]
    return T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    keep_tokens: bool = True,
) -> DataFrame:
    """Encode documents with a fitted merge list:
    ``(doc_id, bpe_tokens ARRAY<STRING>?, n_bpe_tokens BIGINT)``.
    Arrow-batched mapInPandas, map-only; a per-batch word→pieces
    cache exploits word repetition (Zipf again) so the per-token
    amortized cost approaches one dict hit. ``keep_tokens=False``
    returns a null token column (schema-stable) when only counts are
    needed — at corpus scale the count is the common ask and the
    token arrays would dominate the output bytes. Null/empty text
    encodes to 0 tokens, never null — "no tokens" is a measurement,
    not a missing value."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            if lowercase:
                text = text.lower()
            out: list[str] = []
            for w in text.split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        for pdf in it:
            toks = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks if keep_tokens else [None] * len(toks),
                    "n_bpe_tokens": [len(t) for t in toks],
                }
            )

    # prune to the two columns the kernel reads BEFORE the Arrow
    # transfer — mapInPandas ships every input column otherwise
    return df.select(id_col, text_col).mapInPandas(
        batches, _encode_schema(df, id_col)
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """``(doc_id, n_bpe_tokens)`` — the budget-setting count under
    the LEARNED vocabulary (compare text.token_count's whitespace
    proxy). Token arrays are never materialized."""
    return bpe_encode(
        df, merges, id_col, text_col, lowercase, keep_tokens=False
    ).select(id_col, "n_bpe_tokens")
