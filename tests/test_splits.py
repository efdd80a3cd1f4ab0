"""extensions/splits.py — deterministic splits + sequence packing.

The contract under test is REPRODUCIBILITY: the split assignment must
equal an independent Python md5 re-derivation row-for-row (engine
portability is the whole point of choosing md5 over xxhash64), the
grouped variant must never let a near-dup pair straddle train/eval,
and sequence_offsets must agree with a pure-Python token-stream
packer on arbitrary corpora.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from goodtables_pandas_py_spark.extensions.splits import (
    grouped_hash_split,
    hash_split,
    sequence_offsets,
    split_boundaries,
)
from tests.conftest import load


def _py_split(key, salt="", bounds=None):
    bounds = bounds or split_boundaries(None)
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()[:8]
    for name, hi in bounds[:-1]:
        if h < hi:
            return name
    return bounds[-1][0]


def test_split_boundaries_normalize_and_order():
    b = split_boundaries({"train": 8, "val": 1, "test": 1})
    assert [n for n, _ in b] == ["train", "val", "test"]
    assert b[0][1] == "cccccccc" and b[1][1] == "e6666666"
    assert b[-1][1] is None
    with pytest.raises(ValueError):
        split_boundaries({})
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.0})


def test_hash_split_matches_python_md5(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = hash_split(docs, "doc_id", salt="s1").select("doc_id", "split").collect()
    assert rows, "empty documents table"
    for r in rows:
        assert r["split"] == _py_split(r["doc_id"], "s1"), r


def test_hash_split_salt_reshuffles_but_each_is_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in
         hash_split(docs, "doc_id", salt="a").select("doc_id", "split").collect()}
    a2 = {r["doc_id"]: r["split"] for r in
          hash_split(docs, "doc_id", salt="a").select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in
         hash_split(docs, "doc_id", salt="b").select("doc_id", "split").collect()}
    assert a == a2
    assert a != b  # overwhelmingly likely for 500 docs


def test_hash_split_is_map_only(spark, sf_dir):
    plan = hash_split(
        load(spark, sf_dir, "documents"), "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_grouped_hash_split_keeps_components_together(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # chain 0-1-2 plus pair (10,11): both components must be split-pure
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = grouped_hash_split(docs, pairs, "doc_id", salt="v9")
    got = {r["doc_id"]: r["split"] for r in
           out.where(F.col("doc_id").isin(0, 1, 2, 10, 11))
              .select("doc_id", "split").collect()}
    assert got[0] == got[1] == got[2] == _py_split(0, "v9")
    assert got[10] == got[11] == _py_split(10, "v9")


def test_grouped_hash_split_unpaired_rows_match_plain_split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    grouped = {r["doc_id"]: r["split"] for r in
               grouped_hash_split(docs, pairs, "doc_id", salt="z")
               .select("doc_id", "split").collect()}
    plain = {r["doc_id"]: r["split"] for r in
             hash_split(docs, "doc_id", salt="z")
             .select("doc_id", "split").collect()}
    assert set(grouped) == set(plain)  # left join drops no rows
    for k in plain:
        if k not in (0, 1):
            assert grouped[k] == plain[k]


def _py_pack(rows, budget):
    """Pure-Python token-stream packer: rows = [(id, part, tokens)]."""
    out = {}
    streams: dict = {}
    for i, p, n in sorted(rows):
        off = streams.get(p, 0)
        first = off // budget
        last = (off + n - 1) // budget if n > 0 else first
        out[i] = (off, first, last)
        streams[p] = off + n
    return out


def test_sequence_offsets_matches_python_packer(spark):
    rows = [
        (1, "a", 100), (2, "a", 250), (3, "a", 0), (4, "a", 400),
        (5, "b", 512), (6, "b", 1), (7, "b", 511), (8, "b", 513),
    ]
    df = spark.createDataFrame(rows, "doc_id long, part string, n_tokens long")
    got = {
        r["doc_id"]: (r["offset"], r["first_seq"], r["last_seq"])
        for r in sequence_offsets(
            df, "doc_id", "n_tokens", budget=512, part_col="part"
        ).collect()
    }
    assert got == _py_pack(rows, 512)


def test_sequence_offsets_straddler_semantics(spark):
    # 300 + 300 over a 512 budget: second doc straddles seq 0 -> 1
    df = spark.createDataFrame(
        [(1, 300), (2, 300)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r for r in
           sequence_offsets(df, "doc_id", "n_tokens", budget=512).collect()}
    assert (got[1]["first_seq"], got[1]["last_seq"]) == (0, 0)
    assert got[2]["offset"] == 300
    assert (got[2]["first_seq"], got[2]["last_seq"]) == (0, 1)


def test_sequence_offsets_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        sequence_offsets(df, budget=0)


def test_sequence_offsets_partitioned_window_single_shuffle(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("n_tokens")
    )
    plan = sequence_offsets(
        docs, "doc_id", "n_tokens", budget=512, part_col="source"
    )._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the stream key, then a partition-local sort —
    # never a single-partition global sort
    assert plan.count("Exchange") == 1, plan
    assert "SinglePartition" not in plan, plan


# --- property tests (hypothesis) -----------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_SPLIT_FAST = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SPLIT_FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),   # doc id
            st.sampled_from(["a", "b", "c"]),            # stream key
            st.integers(min_value=0, max_value=5000),    # token count
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=2048),
)
def test_sequence_offsets_property_matches_python(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, part string, n_tokens long")
    got = {
        r["doc_id"]: (r["offset"], r["first_seq"], r["last_seq"])
        for r in sequence_offsets(
            df, "doc_id", "n_tokens", budget=budget, part_col="part"
        ).collect()
    }
    assert got == _py_pack(rows, budget)


@_SPLIT_FAST
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
             max_size=40, unique=True),
    st.text(min_size=0, max_size=8),
    st.dictionaries(
        st.sampled_from(["train", "val", "test", "holdout"]),
        st.floats(min_value=0.01, max_value=10.0, allow_nan=False),
        min_size=1, max_size=4,
    ),
)
def test_hash_split_property_matches_python(spark, ids, salt, weights):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    bounds = split_boundaries(weights)
    got = {r["doc_id"]: r["split"] for r in
           hash_split(df, "doc_id", weights=weights, salt=salt).collect()}
    assert got == {i: _py_split(i, salt, bounds) for i in ids}


# --- pack_bins (no-straddle FFD) -----------------------------------------

from goodtables_pandas_py_spark.extensions.splits import pack_bins  # noqa: E402


def _py_pack_bins(rows, budget, num_buckets, salt=""):
    """Pure-Python mirror of pack_bins: rows = [(id, tokens)]."""
    buckets: dict = {}
    for i, n in rows:
        h = int(hashlib.md5((salt + str(i)).encode()).hexdigest()[:8], 16)
        buckets.setdefault(h % num_buckets, []).append((i, n))
    out = {}
    for b, docs in buckets.items():
        bins = []
        for i, n in sorted(docs, key=lambda t: (-t[1], t[0])):
            if n > budget:
                bins.append(0)
                out[i] = (b << 32 | (len(bins) - 1), True)
                continue
            for j, rem in enumerate(bins):
                if rem >= n:
                    bins[j] = rem - n
                    out[i] = (b << 32 | j, False)
                    break
            else:
                bins.append(budget - n)
                out[i] = (b << 32 | (len(bins) - 1), False)
    return out


def test_pack_bins_matches_python_ffd(spark):
    rows = [(i, (i * 137) % 900 + 1) for i in range(200)] + [(1000, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["bin_id"], r["oversize"]) for r in
           pack_bins(df, budget=2048, num_buckets=8, salt="s").collect()}
    assert got == _py_pack_bins(rows, 2048, 8, "s")


def test_pack_bins_respects_budget_and_covers_all(spark):
    rows = [(i, (i * 997) % 2048 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_bins(df, budget=2048, num_buckets=4).collect()
    assert len(out) == len(rows)  # every doc assigned exactly once
    per_bin: dict = {}
    for r in out:
        assert not r["oversize"]
        per_bin[r["bin_id"]] = per_bin.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(tot <= 2048 for tot in per_bin.values())
    # FFD efficiency: bins used is within 2x the token lower bound
    # (guarantee is 11/9 OPT + 1 per bucket; 2x absorbs bucketing loss)
    lower = sum(n for _, n in rows) / 2048
    assert len(per_bin) <= 2 * lower + 4


def test_pack_bins_oversize_gets_dedicated_bin(spark):
    df = spark.createDataFrame(
        [(1, 10_000), (2, 100), (3, 200)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r for r in
           pack_bins(df, budget=1024, num_buckets=1).collect()}
    assert out[1]["oversize"] is True
    assert not out[2]["oversize"] and not out[3]["oversize"]
    assert out[1]["bin_id"] not in (out[2]["bin_id"], out[3]["bin_id"])
    assert out[2]["bin_id"] == out[3]["bin_id"]  # 300 fits one bin


def test_pack_bins_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_bins(df, budget=0)
    with pytest.raises(ValueError):
        pack_bins(df, num_buckets=0)


@_SPLIT_FAST
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=1, max_value=3000),
        ),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=64, max_value=2048),
    st.integers(min_value=1, max_value=8),
)
def test_pack_bins_property_matches_python(spark, rows, budget, nb):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["bin_id"], r["oversize"]) for r in
           pack_bins(df, budget=budget, num_buckets=nb).collect()}
    assert got == _py_pack_bins(rows, budget, nb)


# --- hash_sample ---------------------------------------------------------

from goodtables_pandas_py_spark.extensions.splits import hash_sample  # noqa: E402


def test_hash_sample_deterministic_and_nested(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.10, salt="v").collect()}
    s10b = {r["doc_id"] for r in hash_sample(docs, 0.10, salt="v").collect()}
    s50 = {r["doc_id"] for r in hash_sample(docs, 0.50, salt="v").collect()}
    assert s10 == s10b
    assert s10 <= s50  # nesting: smaller fraction is a subset
    n = docs.count()
    assert 0 < len(s10) < len(s50) < n
    assert {r["doc_id"] for r in hash_sample(docs, 1.0).collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    assert hash_sample(docs, 0.0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_hash_sample_matches_python_md5(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = {r["doc_id"] for r in hash_sample(docs, 0.25, salt="q").collect()}
    want = {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if hashlib.md5(("q" + str(r["doc_id"])).encode()).hexdigest()[:8]
        < format(int(0.25 * 16**8), "08x")
    }
    assert got == want


def test_pack_bins_does_not_mutate_caller_schema(spark):
    """Regression: StructType.add mutates in place — building the
    applyInPandas output schema from df.schema.add() corrupted the
    CALLER's cached schema with phantom bin_id/oversize fields."""
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    before = df.schema.fieldNames()
    out1 = pack_bins(df, budget=10, num_buckets=1)
    assert df.schema.fieldNames() == before
    # second call on the same frame must work and produce one set of
    # output columns, not accumulate duplicates
    out2 = pack_bins(df, budget=10, num_buckets=1)
    assert out1.columns == out2.columns == [*before, "bin_id", "oversize"]
    assert out2.count() == 1


def test_pack_bins_null_token_count_is_zero(spark):
    """Arrow renders a long column with nulls as float64 NaN in the
    pandas batch; a null count must pack as 0 tokens, not crash."""
    df = spark.createDataFrame(
        [(1, 100), (2, None), (3, 50)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r for r in
           pack_bins(df, budget=128, num_buckets=1).collect()}
    assert len(out) == 3
    assert not out[2]["oversize"]
    # null-token doc consumes no capacity: 100 + 50 + 0 fit... 100+50
    # exceeds 128, so doc 1 and doc 3 split; doc 2 joins the first bin
    sums = {}
    for r in out.values():
        sums.setdefault(r["bin_id"], 0)
        sums[r["bin_id"]] += r["n_tokens"] or 0
    assert all(s <= 128 for s in sums.values())


def test_grouped_split_with_real_minhash_pairs_no_leakage(spark, sf_dir):
    """Integration: near-dup pairs from the real MinHash pipeline must
    never straddle a split boundary under grouped_hash_split — the
    leakage guarantee, end to end on the testdata documents."""
    from goodtables_pandas_py_spark.extensions.dedup import (
        minhash_dedup_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.5).select("id_a", "id_b")
    assert pairs.count() > 0, "testdata should contain near-dups"
    out = grouped_hash_split(docs, pairs, "doc_id", salt="leak")
    split_of = out.select("doc_id", "split")
    straddlers = (
        pairs.join(
            split_of.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("split", "split_a"),
            "id_a",
        )
        .join(
            split_of.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("split", "split_b"),
            "id_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddlers == 0


# --- weighted_hash_sample ------------------------------------------------

from goodtables_pandas_py_spark.extensions.splits import (  # noqa: E402
    weighted_hash_sample,
)


def test_weighted_hash_sample_matches_python_and_is_monotone(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (1.0 / (1 + F.col("doc_id") % 10)).alias("w")
    )
    got = {r["doc_id"] for r in
           weighted_hash_sample(docs, F.col("w"), salt="wq").collect()}
    want = set()
    for r in docs.collect():
        frac = int(hashlib.md5(("wq" + str(r["doc_id"])).encode())
                   .hexdigest()[:8], 16) / 16**8
        if frac < r["w"]:
            want.add(r["doc_id"])
    assert got == want and 0 < len(got) < docs.count()
    # monotone: doubling every weight only adds rows
    more = {r["doc_id"] for r in weighted_hash_sample(
        docs, F.least(F.col("w") * 2, F.lit(1.0)), salt="wq").collect()}
    assert got <= more


def test_weighted_hash_sample_clamps_weights(spark):
    df = spark.createDataFrame(
        [(1, -0.5), (2, 2.0)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in
           weighted_hash_sample(df, F.col("w")).collect()}
    assert got == {2}  # w<=0 never kept; w>=1 always kept


def test_weighted_hash_sample_null_weight_drops_documentedly(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in
           weighted_hash_sample(df, F.col("w")).collect()}
    assert got == {2}


# ------------------------------------------------------------ top_k_per_group

def test_top_k_per_group_matches_duckdb(spark):
    """Oracle parity with DuckDB's ROW_NUMBER window, deterministic
    via tiebreak id."""
    import random

    import duckdb

    from goodtables_pandas_py_spark.extensions.splits import top_k_per_group

    rng = random.Random(3)
    rows = [
        (f"d{rng.randrange(5)}", rng.randrange(20) / 10.0, i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "domain string, score double, id long")
    got = {
        (r["domain"], r["id"])
        for r in top_k_per_group(
            df, ["domain"], "score", 7, tiebreak=["id"]
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        tuple(r)
        for r in con.execute(
            "SELECT domain, id FROM (SELECT domain, id, row_number()"
            " OVER (PARTITION BY domain ORDER BY score DESC, id) AS rn"
            " FROM t) WHERE rn <= 7"
        ).fetchall()
    }
    assert got == want


def test_top_k_per_group_salted_prune_preserves_answer(spark):
    """The two-phase hot-group path returns EXACTLY the same set as
    the single-window path (the prune provably keeps every true
    winner), and ascending order works."""
    import random

    from goodtables_pandas_py_spark.extensions.splits import top_k_per_group

    rng = random.Random(9)
    rows = [
        ("hot" if i < 900 else f"d{i % 7}", float(rng.randrange(1000)), i)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "domain string, score double, id long")
    for desc in (True, False):
        plain = {
            (r["domain"], r["id"])
            for r in top_k_per_group(
                df, ["domain"], "score", 10, descending=desc,
                tiebreak=["id"],
            ).collect()
        }
        salted = {
            (r["domain"], r["id"])
            for r in top_k_per_group(
                df, ["domain"], "score", 10, descending=desc,
                tiebreak=["id"], prune_salts=8,
            ).collect()
        }
        assert salted == plain


def test_top_k_per_group_caps_group_size(spark):
    from goodtables_pandas_py_spark.extensions.splits import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1.0, i) for i in range(50)] + [("b", 1.0, 99)],
        "domain string, score double, id long",
    )
    got = top_k_per_group(df, ["domain"], "score", 3, tiebreak=["id"])
    counts = {r["domain"]: r["n"] for r in
              got.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 3, "b": 1}


def test_top_k_per_group_rejects_bad_args(spark):
    import pytest as _pytest

    from goodtables_pandas_py_spark.extensions.splits import top_k_per_group

    df = spark.createDataFrame([("a", 1.0, 1)], "d string, s double, i long")
    with _pytest.raises(ValueError, match="k must"):
        top_k_per_group(df, ["d"], "s", 0)
    with _pytest.raises(ValueError, match="group_cols"):
        top_k_per_group(df, [], "s", 1)
    with _pytest.raises(ValueError, match="tiebreak"):
        top_k_per_group(df, ["d"], "s", 1, prune_salts=4)


# --------------------------------------------- review-finding regressions

def test_split_expr_null_id_gets_null_split(spark):
    from goodtables_pandas_py_spark.extensions.splits import hash_split

    df = spark.createDataFrame([(1,), (None,), (2,)], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert got[None] is None            # visible, not silently 'test'
    assert got[1] is not None and got[2] is not None


def test_split_boundaries_reject_negative_weights():
    import pytest as _pytest

    from goodtables_pandas_py_spark.extensions.splits import split_boundaries

    with _pytest.raises(ValueError, match="non-negative"):
        split_boundaries({"a": -0.5, "b": 1.5})


def test_hash_sample_fraction_just_under_one_keeps_everything(spark):
    import math

    from goodtables_pandas_py_spark.extensions.splits import hash_sample

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    frac = math.nextafter(1.0, 0.0)
    kept = hash_sample(df, frac).count()
    assert kept >= 195          # ~100%, not ~6% (9-hex-char bound bug)


def test_grouped_hash_split_tolerates_component_column(spark):
    from goodtables_pandas_py_spark.extensions.splits import grouped_hash_split

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "doc_id long, component string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = grouped_hash_split(df, pairs)
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in out.collect()}
    assert rows[1][0] == "x"            # user column intact
    assert rows[1][1] == rows[2][1]     # pair still splits together


def test_pack_bins_zero_token_doc_never_rides_oversize_bin(spark):
    from goodtables_pandas_py_spark.extensions.splits import pack_bins

    df = spark.createDataFrame(
        [(1, 5000), (2, 0), (3, None)], "doc_id long, n_tokens long"
    )
    rows = {r["doc_id"]: r for r in
            pack_bins(df, budget=100, num_buckets=1).collect()}
    assert rows[1]["oversize"]
    assert rows[2]["bin_id"] != rows[1]["bin_id"]
    assert rows[3]["bin_id"] != rows[1]["bin_id"]
    assert rows[2]["bin_id"] == rows[3]["bin_id"]   # both fit a normal bin


# --- mixture sampling -------------------------------------------------------

from goodtables_pandas_py_spark.extensions.splits import (  # noqa: E402
    mixture_rates,
    mixture_sample,
)


def _mixture_df(spark):
    # skewed corpus: 6000 web / 3000 code / 1000 books
    return spark.range(10_000).selectExpr(
        "id as doc_id",
        "case when id < 6000 then 'web' "
        "when id < 9000 then 'code' else 'books' end as source",
    )


def test_mixture_rates_default_total_is_scarcest_epoch(spark):
    df = _mixture_df(spark)
    rates = mixture_rates(df, {"web": 0.2, "code": 0.3, "books": 0.5}, "source")
    # books is scarcest: total = 1000/0.5 = 2000 -> 400/600/1000 rows
    assert rates["books"] == pytest.approx(1.0)
    assert rates["web"] == pytest.approx(400 / 6000)
    assert rates["code"] == pytest.approx(600 / 3000)


def test_mixture_sample_hits_proportions_and_is_deterministic(spark):
    df = _mixture_df(spark)
    w = {"web": 0.2, "code": 0.3, "books": 0.5}
    out = mixture_sample(df, w, "source").cache()
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # expected 400/600/1000 within Bernoulli noise (books is rate 1.0,
    # so exact)
    assert counts["books"] == 1000
    assert abs(counts["web"] - 400) < 80
    assert abs(counts["code"] - 600) < 100
    # deterministic: identical id sets on a rerun
    again = mixture_sample(df, w, "source")
    assert out.select("doc_id").subtract(again.select("doc_id")).count() == 0
    assert again.select("doc_id").subtract(out.select("doc_id")).count() == 0
    # schema unchanged (no epoch column without upsampling)
    assert out.columns == df.columns


def test_mixture_sample_upsample_epochs(spark):
    df = _mixture_df(spark)
    w = {"web": 0.2, "code": 0.3, "books": 0.5}
    # total 4000 -> books rate 2.0 (needs repeats), web 800/6000, code 1200/3000
    with pytest.raises(ValueError, match="upsampling"):
        mixture_sample(df, w, "source", total=4000)
    out = mixture_sample(
        df, w, "source", total=4000, allow_upsample=True
    ).cache()
    assert "epoch" in out.columns
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["books"] == 2000          # rate exactly 2.0: two epochs
    assert abs(counts["web"] - 800) < 110
    assert abs(counts["code"] - 1200) < 130
    # every (id, epoch) unique; epochs dense from 0
    n = out.count()
    assert out.select("doc_id", "epoch").distinct().count() == n
    assert out.agg(F.min("epoch")).first()[0] == 0
    books_epochs = out.where("source = 'books'").groupBy("doc_id").count()
    assert books_epochs.where("count != 2").count() == 0


def test_mixture_sample_unknown_domain_dropped_and_missing_raises(spark):
    df = _mixture_df(spark)
    # domain not in weights -> contributes nothing
    out = mixture_sample(df, {"books": 1.0}, "source")
    assert out.where("source != 'books'").count() == 0
    assert out.count() == 1000
    with pytest.raises(ValueError, match="no rows"):
        mixture_rates(df, {"martian": 1.0}, "source")
    with pytest.raises(ValueError, match="non-negative"):
        mixture_rates(df, {"web": -1.0}, "source")


# ------------------------------------------------- quality binning (r6)

from goodtables_pandas_py_spark.extensions.splits import (  # noqa: E402
    quality_bins,
    quality_thresholds,
)


def test_quality_bins_explicit_thresholds_semantics(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 1.0), (3, 1.5), (4, 2.0), (5, 9.9), (6, None)],
        "id long, s double",
    )
    out = {
        r["id"]: r["quality_bin"]
        for r in quality_bins(df, "s", thresholds=[1.0, 2.0]).collect()
    }
    # bin k = (t_{k-1}, t_k]: values AT a threshold bin downward
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: None}
    with pytest.raises(ValueError, match="ascending"):
        quality_bins(df, "s", thresholds=[2.0, 1.0])
    with pytest.raises(ValueError, match="n_bins"):
        quality_thresholds(df, "s", n_bins=1)


def test_quality_bins_balanced_and_monotone(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn(
        "score", F.length("text").cast("double")
    )
    n = docs.count()
    binned = quality_bins(docs, "score", n_bins=5, relative_error=1e-6)
    sizes = {
        r["quality_bin"]: r["n"]
        for r in binned.groupBy("quality_bin").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(sizes) == {1, 2, 3, 4, 5}
    for b, cnt in sizes.items():
        assert abs(cnt - n / 5) <= n * 0.08 + 5, (b, cnt, n)
    # monotone: the max score of bin k never exceeds the min of k+1
    stats = {
        r["quality_bin"]: (r["lo"], r["hi"])
        for r in binned.groupBy("quality_bin").agg(
            F.min("score").alias("lo"), F.max("score").alias("hi")
        ).collect()
    }
    for b in range(1, 5):
        assert stats[b][1] <= stats[b + 1][0], stats


def test_quality_bins_serving_shape_no_refit(spark, sf_dir):
    """Thresholds fitted once bin a DIFFERENT frame with zero extra
    jobs, and identically to refitting on the same data."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "score", F.length("text").cast("double")
    )
    ts = quality_thresholds(docs, "score", n_bins=4, relative_error=1e-6)
    later = docs.limit(100)
    a = {
        r["doc_id"]: r["quality_bin"]
        for r in quality_bins(later, "score", thresholds=ts).collect()
    }
    b = {
        r["doc_id"]: r["quality_bin"]
        for r in quality_bins(docs, "score", n_bins=4, relative_error=1e-6)
        .join(later.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    assert a == b
    # map-only: binning with explicit thresholds is scan+project, no
    # shuffle anywhere in the plan
    plan = (
        quality_bins(docs, "score", thresholds=ts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ------------------------------------------- training_shuffle (r8)


def test_training_shuffle_is_deterministic_permutation(spark, sf_dir, tmp_path):
    from goodtables_pandas_py_spark.extensions.splits import (
        training_shuffle,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = [
        r["doc_id"]
        for r in training_shuffle(docs, partitions=8).collect()
    ]
    b = [
        r["doc_id"]
        for r in training_shuffle(docs, partitions=8).collect()
    ]
    assert a == b, "same salt must reproduce the identical order"
    src = sorted(r["doc_id"] for r in docs.collect())
    assert sorted(a) == src, "must be a permutation, not a sample"
    assert a != src, "must not come out id-ordered"
    c = [
        r["doc_id"]
        for r in training_shuffle(docs, salt="epoch1", partitions=8).collect()
    ]
    assert sorted(c) == src and c != a, "new salt = fresh permutation"


def test_training_shuffle_plan_is_one_hash_exchange(spark, sf_dir):
    from goodtables_pandas_py_spark.extensions.splits import (
        training_shuffle,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = training_shuffle(docs, partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        l for l in plan.splitlines() if "Exchange" in l
    ]
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(__shuffle_key" in exchanges[0], exchanges
    assert "rangepartitioning" not in plan, (
        "range partitioner would add a sampling job and break "
        "determinism"
    )


def test_training_shuffle_survives_parquet_roundtrip(
    spark, sf_dir, tmp_path
):
    """The property that matters to a trainer: the part files, read
    in NAME order with in-file row order (exactly how a dataloader
    streams a corpus), reproduce the shuffled order. (A Spark
    re-read is NOT order-preserving — FilePartition packing sorts
    files by size — which is why the contract is over the files.)"""
    import os

    import pyarrow.parquet as pq

    from goodtables_pandas_py_spark.extensions.splits import (
        training_shuffle,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = training_shuffle(docs, partitions=8)
    want = [r["doc_id"] for r in out.collect()]
    path = str(tmp_path / "shuffled.parquet")
    out.write.parquet(path)
    got = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            got.extend(
                pq.read_table(os.path.join(path, name))
                .column("doc_id")
                .to_pylist()
            )
    assert got == want
    # and a Spark re-read is still the same multiset
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(path).collect()
    ) == sorted(want)


# --------------------------------------- select_token_budget (r8)


def _budget_reference(rows, budget):
    """Independent greedy-prefix reference: rows = [(id, score, tokens,
    hash)] taken in (score desc, hash asc, id asc) order while the
    running total stays within budget; stop at the first overflow."""
    order = sorted(rows, key=lambda r: (-r[1], r[3], r[0]))
    out, total = [], 0
    for rid, score, tok, h in order:
        if total + tok > budget:
            break
        total += tok
        out.append(rid)
    return sorted(out), total


def test_select_token_budget_matches_greedy_prefix(spark):
    from pyspark.sql import functions as F

    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget,
    )

    rng_rows = [
        (i, float((i * 37) % 100) / 10.0, 50 + (i * 13) % 200)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rng_rows, "doc_id long, score double, n_tokens int"
    )
    # the operator's own tiebreak hash, collected once so the Python
    # reference follows the identical order
    tie = df.select(
        "doc_id",
        F.xxhash64(
            F.concat(
                F.lit(""),
                F.concat(F.lit("v"), F.col("doc_id").cast("string")),
            )
        ).alias("h"),
    ).collect()
    hmap = {r["doc_id"]: r["h"] for r in tie}
    rows = [(i, s, t, hmap[i]) for i, s, t in rng_rows]

    for budget in (500, 7_000, 20_000, 1):
        got = select_token_budget(df, budget, buckets=16)
        got_ids = sorted(r["doc_id"] for r in got.collect())
        got_total = (
            got.agg(F.sum("n_tokens").alias("t")).first()["t"] or 0
        )
        want_ids, want_total = _budget_reference(rows, budget)
        assert got_ids == want_ids, f"budget {budget}"
        assert got_total == want_total <= budget

    # everything fits -> identity
    all_rows = select_token_budget(df, 10**9)
    assert all_rows.count() == 400


def test_select_token_budget_edges(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget,
    )

    # single score atom: span == 0 -> everything is the boundary
    # bucket; selection is still the deterministic hash prefix
    df = spark.createDataFrame(
        [(i, 1.0, 100) for i in range(20)],
        "doc_id long, score double, n_tokens int",
    )
    got = select_token_budget(df, 450)
    assert got.count() == 4
    assert (
        got.agg(F.sum("n_tokens").alias("t")).first()["t"] == 400
    )
    # same salt -> same rows; different salt -> (almost surely)
    # different ties make the cut, same size
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(
        r["doc_id"] for r in select_token_budget(df, 450).collect()
    )
    c = sorted(
        r["doc_id"]
        for r in select_token_budget(df, 450, salt="ep1").collect()
    )
    assert a == b and len(c) == 4 and c != a

    # null scores / null+negative tokens are excluded up front
    dirty = spark.createDataFrame(
        [(1, None, 10), (2, 1.0, None), (3, 1.0, -5), (4, 2.0, 10)],
        "doc_id long, score double, n_tokens int",
    )
    kept = select_token_budget(dirty, 5_000)
    assert [r["doc_id"] for r in kept.collect()] == [4]

    with _pytest.raises(ValueError, match="budget"):
        select_token_budget(df, 0)


def test_select_token_budget_plans_no_global_sort(spark, sf_dir):
    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("double").alias("score"),
        (F.length("text") / 4).cast("int").alias("n_tokens"),
    )
    out = select_token_budget(docs, 5_000, buckets=64)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # a naive ORDER BY score + running sum would range-partition the
    # whole table; the operator's only sort is the boundary-bucket
    # window (SinglePartition over the FILTERED edge rows)
    assert "rangepartitioning" not in plan.lower(), plan


def test_select_token_budget_by_matches_per_group_runs(spark):
    """Per-group selection == running the single-group operator on
    each group independently (also proves bucket-count invariance:
    the grouped path uses different bucket granularity, yet the
    greedy-prefix outcome is identical)."""
    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget,
        select_token_budget_by,
    )

    rows = [
        (i, ["web", "code", "chat"][i % 3],
         float((i * 37) % 100) / 10.0, 50 + (i * 13) % 200)
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, score double, n_tokens int"
    )
    budgets = {"web": 2_000, "code": 10**9, "chat": 1}
    got = select_token_budget_by(
        df, budgets, by="source", buckets=8
    )
    got_ids = sorted(r["doc_id"] for r in got.collect())
    want = []
    for g, b in budgets.items():
        sub = select_token_budget(
            df.where(F.col("source") == g).drop("source"), b
        )
        want.extend(r["doc_id"] for r in sub.collect())
    assert got_ids == sorted(want)
    # over-budget groups never exceed their quota
    sums = {
        r["source"]: r["t"]
        for r in got.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert sums["web"] <= 2_000
    assert "chat" not in sums or sums["chat"] <= 1
    # int budget applies to every group; dict drops absent groups
    all_groups = select_token_budget_by(df, 10**9, by="source")
    assert all_groups.count() == 300
    only_web = select_token_budget_by(
        df, {"web": 10**9}, by="source"
    )
    assert only_web.select("source").distinct().collect()[0][0] == "web"


def test_select_token_budget_by_plan_is_broadcast_and_grouped(spark):
    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget_by,
    )

    rows = [
        (i, ["a", "b"][i % 2], float(i % 50), 100) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, score double, n_tokens int"
    )
    out = select_token_budget_by(df, 3_000, by="source", buckets=8)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_write_curriculum_bin_major_shuffled_within(spark, tmp_path):
    """write_curriculum: bin=<k> dirs in ascending order, each bin's
    files streaming back (name order) as that bin's training_shuffle
    permutation; null bins skipped but counted."""
    import os

    import pyarrow.parquet as pq

    from goodtables_pandas_py_spark.extensions.splits import (
        training_shuffle,
        write_curriculum,
    )

    rows = [(i, f"d{i}", i % 3 if i % 7 else None) for i in range(90)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, quality_bin int"
    )
    path = str(tmp_path / "curr")
    man = write_curriculum(df, path, salt="ep0", partitions=4)
    n_null = sum(1 for *_, b in rows if b is None)
    assert man["__null__"] == n_null
    assert sum(v for k, v in man.items() if k != "__null__") == 90 - n_null

    dirs = sorted(d for d in os.listdir(path) if d.startswith("bin="))
    assert dirs == ["bin=000000", "bin=000001", "bin=000002"]
    for d, b in zip(dirs, (0, 1, 2)):
        got = []
        full = os.path.join(path, d)
        for name in sorted(os.listdir(full)):
            if name.endswith(".parquet"):
                got.extend(
                    pq.read_table(os.path.join(full, name))
                    .column("doc_id")
                    .to_pylist()
                )
        want = [
            r["doc_id"]
            for r in training_shuffle(
                df.where(F.col("quality_bin") == b),
                salt=f"ep0|bin={b}",
                partitions=4,
            ).collect()
        ]
        assert got == want, f"bin {b} order diverged"
        assert len(got) == man[str(b)]


# ----------------------------------------- ADVICE r8 regressions


def test_select_token_budget_nan_scores_are_excluded(spark):
    """NaN passes isNotNull and Spark orders it above every real
    double, so an unfiltered NaN would null the bucket span and
    silently select (almost) nothing (ADVICE r8) — NaN rows are
    excluded like nulls, and the real rows still fill the budget."""
    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget,
        select_token_budget_by,
    )

    nan = float("nan")
    df = spark.createDataFrame(
        [(1, nan, 100), (2, 5.0, 100), (3, 1.0, 100), (4, nan, 100)],
        "doc_id long, score double, n_tokens int",
    )
    got = sorted(r["doc_id"] for r in select_token_budget(df, 200).collect())
    assert got == [2, 3]
    # NaN token counts are excluded too (NaN >= 0 is TRUE in Spark)
    df2 = spark.createDataFrame(
        [(1, 5.0, nan), (2, 4.0, 100.0)],
        "doc_id long, score double, n_tokens double",
    )
    assert [
        r["doc_id"] for r in select_token_budget(df2, 10**6).collect()
    ] == [2]
    # per-group arm shares the filter
    dfg = spark.createDataFrame(
        [(1, "a", nan, 100), (2, "a", 2.0, 100), (3, "b", 1.0, 100)],
        "doc_id long, source string, score double, n_tokens int",
    )
    by = sorted(
        r["doc_id"]
        for r in select_token_budget_by(dfg, 100, by="source").collect()
    )
    assert by == [2, 3]


def test_select_token_budget_by_canonical_keys_and_mismatch(spark):
    """budgets dict keys match raw values OR their canonical string
    rendering (the documented _part_key form: booleans are
    'true'/'false'); a dict matching NO group raises instead of
    silently selecting nothing (ADVICE r8 medium)."""
    import pytest as _pytest

    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget_by,
    )

    df = spark.createDataFrame(
        [(i, i % 2 == 0, float(i), 100) for i in range(40)],
        "doc_id long, flagged boolean, score double, n_tokens int",
    )
    # canonical-string keys for a boolean by-column ('true', not 'True')
    got = select_token_budget_by(
        df, {"true": 300, "false": 10**9}, by="flagged", buckets=4
    )
    sums = {
        r["flagged"]: r["t"]
        for r in got.groupBy("flagged").agg(
            F.sum("n_tokens").alias("t")
        ).collect()
    }
    assert sums[True] == 300 and sums[False] == 2_000
    # raw typed keys still work (and win)
    raw = select_token_budget_by(
        df, {True: 300}, by="flagged", buckets=4
    )
    assert raw.count() == 3
    # a fully mismatched dict is loud, not an empty frame
    with _pytest.raises(ValueError, match="no budgets key matched"):
        select_token_budget_by(df, {"True": 300}, by="flagged")


def test_write_curriculum_bool_and_negative_bins(spark, tmp_path):
    """bool bins render canonically ('true'/'false' dirs, never the
    int-collision '000001'); negative int bins are refused — they
    would break lexical==numeric directory ordering (ADVICE r8)."""
    import os

    import pytest as _pytest

    from goodtables_pandas_py_spark.extensions.splits import (
        write_curriculum,
    )

    df = spark.createDataFrame(
        [(i, f"d{i}", i % 2 == 0) for i in range(20)],
        "doc_id long, text string, quality_bin boolean",
    )
    path = str(tmp_path / "cb")
    man = write_curriculum(df, path, partitions=2)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("bin="))
    assert dirs == ["bin=false", "bin=true"]
    assert man == {"false": 10, "true": 10}

    neg = spark.createDataFrame(
        [(1, "x", -1), (2, "y", 0)],
        "doc_id long, text string, quality_bin int",
    )
    with _pytest.raises(ValueError, match="negative int bin"):
        write_curriculum(neg, str(tmp_path / "neg"), partitions=2)


def test_session_shuffle_partitions_tolerates_auto(spark):
    """spark.sql.shuffle.partitions='auto' (Databricks AQE autotune —
    OSS Spark refuses the value at conf.set time, managed forks
    don't) must not crash training_shuffle's partitions default
    (ADVICE r8). Simulated with a stub session: the fallback chain is
    conf int -> defaultParallelism -> 200."""
    from goodtables_pandas_py_spark.extensions.splits import (
        _session_shuffle_partitions,
    )

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, key):
            return self._v

    class _Ctx:
        defaultParallelism = 7

    class _Sess:
        def __init__(self, v, ctx=True):
            self.conf = _Conf(v)
            if ctx:
                self.sparkContext = _Ctx()

    assert _session_shuffle_partitions(_Sess("32")) == 32
    assert _session_shuffle_partitions(_Sess("auto")) == 7
    assert _session_shuffle_partitions(_Sess("auto", ctx=False)) == 200
    # and the real session path still resolves to an int
    assert _session_shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_select_token_budget_infinite_scores_are_excluded(spark):
    """±inf scores would NaN the bucket affine transform for every
    finite score (least() null-skips them all into the top bucket —
    the no-global-sort contract silently dies); they are excluded
    like NaN (r9)."""
    inf = float("inf")
    from goodtables_pandas_py_spark.extensions.splits import (
        select_token_budget,
    )

    df = spark.createDataFrame(
        [(1, inf, 100), (2, -inf, 100), (3, 5.0, 100), (4, 1.0, 100)],
        "doc_id long, score double, n_tokens int",
    )
    got = sorted(
        r["doc_id"] for r in select_token_budget(df, 100).collect()
    )
    assert got == [3]


def test_pack_bins_null_id_does_not_crash(spark):
    """r10 review fix: a NULL id nulled the hash->bucket chain, Arrow
    rendered the bucket as NaN, and int(NaN) crashed the kernel; null
    ids now land deterministically in one bucket and pack normally."""
    from goodtables_pandas_py_spark.extensions.splits import pack_bins

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 30), (None, 5)],
        "doc_id long, n_tokens long",
    )
    out = pack_bins(df, budget=64, num_buckets=4).collect()
    assert len(out) == 4
    assert all(r["bin_id"] is not None for r in out)
    assert not any(r["oversize"] for r in out)
