"""extensions/web.py — URL/domain curation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from goodtables_pandas_py_spark.extensions.web import (
    domain_counts,
    filter_blocked_domains,
    registered_domain,
    url_domain,
    url_host,
)


def test_url_host_and_domain(spark):
    rows = [
        (1, "https://Blog.Example.COM/post/1?q=x"),
        (2, "http://deep.sub.example.co.uk/page"),
        (3, "https://example.com"),
        (4, "not a url"),
        (5, None),
        (6, "http://192.168.0.1/admin"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: (r["h"], r["d"]) for r in df.select(
        "id",
        url_host(F.col("url")).alias("h"),
        url_domain(F.col("url")).alias("d"),
    ).collect()}
    assert got[1] == ("blog.example.com", "example.com")
    assert got[2] == ("deep.sub.example.co.uk", "example.co.uk")
    assert got[3] == ("example.com", "example.com")
    assert got[4] == (None, None)
    assert got[5] == (None, None)
    assert got[6] == ("192.168.0.1", "192.168.0.1")  # IPs pass through


def test_registered_domain_short_hosts(spark):
    df = spark.createDataFrame(
        [("localhost",), ("example.com",), ("co.uk",)], "h string"
    )
    got = [r["d"] for r in df.select(
        registered_domain(F.col("h")).alias("d")
    ).collect()]
    assert got == ["localhost", "example.com", "co.uk"]


def test_filter_blocked_domains_list_and_df(spark):
    rows = [
        (1, "https://spam.example.com/a"),      # blocked (example.com)
        (2, "https://fine.example.org/b"),      # kept
        (3, "https://x.bad.co.uk/c"),           # blocked (bad.co.uk)
        (4, "garbage"),                          # null domain -> kept
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    blocked = ["Example.COM", "bad.co.uk"]
    kept = {r["id"] for r in
            filter_blocked_domains(df, blocked).collect()}
    assert kept == {2, 4}
    blocked_df = spark.createDataFrame(
        [(d,) for d in blocked], "domain string"
    )
    kept2 = {r["id"] for r in
             filter_blocked_domains(df, blocked_df).collect()}
    assert kept2 == kept
    plan = filter_blocked_domains(df, blocked)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Broadcast" in plan and "SortMergeJoin" not in plan


def test_domain_counts(spark):
    rows = [
        (1, "https://a.example.com/1"),
        (2, "https://b.example.com/2"),
        (3, "https://other.org/3"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["domain"]: r["n_docs"] for r in domain_counts(df).collect()}
    assert got == {"example.com": 2, "other.org": 1}


def test_trailing_dot_fqdn_cannot_evade_blocklist(spark):
    """Regression: 'https://example.com./x' (RFC-legal trailing dot)
    once resolved to registrable domain 'com.' and sailed past any
    blocklist."""
    df = spark.createDataFrame(
        [(1, "https://spam.example.com./a"), (2, "https://ok.org/b")],
        "id long, url string",
    )
    doms = {r["id"]: r["d"] for r in df.select(
        "id", url_domain(F.col("url")).alias("d")).collect()}
    assert doms[1] == "example.com"
    kept = {r["id"] for r in
            filter_blocked_domains(df, ["example.com"]).collect()}
    assert kept == {2}


def test_blocklist_host_entries_block_self_and_subdomains(spark):
    """Host-style entries (cased, trailing dot) block themselves and
    their subdomains — and ONLY those: a tenant-specific entry must
    not take down sibling subdomains via the registrable domain
    (platform over-blocking), and URL-form entries (URLhaus publishes
    URLs) must normalize to their host rather than silently matching
    nothing."""
    df = spark.createDataFrame(
        [(1, "https://www.evil.example.com/x"),
         (2, "https://clean.example.org/y"),
         (3, "https://deep.www.evil.example.com/z"),
         (4, "https://anything.evil.example.com/w"),   # SIBLING: kept
         (5, "https://bad.site.io/p")],
        "id long, url string",
    )
    kept = {r["id"] for r in filter_blocked_domains(
        df, ["www.Evil.example.COM.", "https://bad.site.io/some/path"]
    ).collect()}
    assert kept == {2, 4}


def test_blocklist_entries_normalize_padding_and_paths(spark):
    """r11 review regression: a whitespace/CRLF-padded URL entry made
    try_parse_url return null and the entry silently dropped from the
    blocklist (fail-OPEN); a scheme-less host+path entry normalized to
    a slash-bearing string that could never match a host suffix. Both
    forms must block."""
    df = spark.createDataFrame(
        [(1, "http://evil.com/x"),
         (2, "https://sub.bad.org/y"),
         (3, "https://fine.example.org/z")],
        "id long, url string",
    )
    blocked = [" http://evil.com/some/path \r\n", "bad.org/malware.html"]
    kept = {r["id"] for r in filter_blocked_domains(df, blocked).collect()}
    assert kept == {3}


def test_blocklist_entry_ports_and_midstring_scheme(spark):
    """r11 review: 'host:port' entries must match their host (url_host
    strips ports on the corpus side), and a scheme-less entry whose
    PATH contains '://' is a host entry, not a URL to fail-open on."""
    from goodtables_pandas_py_spark.extensions.web import (
        filter_blocked_domains,
    )

    docs = spark.createDataFrame(
        [(1, "https://evil.com/x"), (2, "https://sub.bad.org/y"),
         (3, "https://fine.net/z")],
        "doc_id long, url string",
    )
    blocked = ["evil.com:8080/mal.exe", "bad.org/redirect?u=https://x"]
    kept = filter_blocked_domains(docs, blocked)
    assert {r["doc_id"] for r in kept.collect()} == {3}
