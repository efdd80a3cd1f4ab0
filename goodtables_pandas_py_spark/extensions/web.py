"""URL/domain operators for web-corpus curation (SURVEY.md §2.9
family — not in the reference): the blocklist-and-attribution steps a
crawl-derived training corpus runs before anything else. All pure
Column algebra over Spark's built-in ``parse_url`` — map-only, no
UDF; the blocklist join broadcasts (blocklists are thousands of
domains, the corpus is the big side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: common multi-label public suffixes for the registered-domain
#: heuristic (a small, public, stable subset — NOT the full Public
#: Suffix List; see :func:`registered_domain`)
CC_SLDS = [
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
]


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (``try_parse_url(url, 'HOST')`` —
    the fail-soft form: a crawl always contains malformed URLs, and
    they must become null, not kill the job). Scheme-less inputs
    ('example.com/x') have no host per RFC parsing — normalize
    upstream if the corpus mixes bare domains in. A trailing dot
    (RFC-legal FQDN form, 'example.com.') is stripped — otherwise
    every downstream domain comparison silently misses, which for a
    BLOCKLIST means trivial evasion."""
    return F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"\.$", ""
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain of a host — the unit blocklists target
    ('foo.bar.example.co.uk' → 'example.co.uk', 'a.b.example.com' →
    'example.com'). Heuristic: last two labels, or last three when
    the two-label tail is a known multi-label suffix (:data:`CC_SLDS`
    — a small public subset, not the full Public Suffix List; hosts
    under exotic suffixes resolve one label short, which for
    BLOCKING is the conservative direction: it blocks the wider
    group). Null/IP-looking hosts pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(r"^[0-9.]+$")
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    two_label_suffix = last2.isin(*CC_SLDS)
    return (
        F.when(host.isNull() | is_ip | (n <= 2), host)
        .when(two_label_suffix, last3)  # n >= 3 here by construction
        .otherwise(last2)
    )


def url_domain(url: Column) -> Column:
    """Registrable domain straight from a URL column."""
    return registered_domain(url_host(url))


def _normalize_block_entry(raw: Column) -> Column:
    """Blocklist entry → host: full URLs (URLhaus publishes URLs, not
    hosts) go through url_host; bare hosts are lowercased with any
    trailing dot stripped — the SAME normalization url_host applies
    to the corpus side, so the two cannot drift.

    The entry is trimmed FIRST: blocklist files routinely carry
    padding/CRLF, and ``try_parse_url`` on a space-padded URL returns
    null — which silently dropped the entry from the list (fail-OPEN
    for exactly the rows the list exists to block). Scheme-less
    host+path entries ('evil.com/path') keep only the host part, and
    a ':port' suffix is stripped from it — neither can participate in
    a host-suffix match (url_host drops ports on the corpus side), so
    leaving them in made the entry silently ineffective the same way.
    URL routing keys on an actual SCHEME PREFIX, not contains('://'):
    'evil.com/redirect?u=https://x' is a host+path entry whose host
    must survive, not a URL for url_host to fail-open on (r11)."""
    # NOT F.trim: trim strips only the space character, and blocklist
    # lines read without newline splitting carry \r\n / tabs
    entry = F.regexp_replace(raw, r"^\s+|\s+$", "")
    # port first, then trailing dot: 'evil.com.:8080' → 'evil.com'
    bare = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(entry, r"^([^/]*)", 1)),
            r":\d+$",
            "",
        ),
        r"\.$",
        "",
    )
    return F.when(
        entry.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), url_host(entry)
    ).otherwise(bare)


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: a.b.example.com →
    [a.b.example.com, b.example.com, example.com, com]. Bounded by
    the label count (hosts have a handful), and turns suffix matching
    into an EQUI-join (an endswith join condition would plan a
    BroadcastNestedLoopJoin)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame | list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose URL's host equals a blocklist entry OR lives
    under one (suffix match on label boundaries): entry 'evil.com'
    blocks evil.com and www.evil.com; entry
    'evil-bucket.s3.amazonaws.com' blocks that bucket WITHOUT taking
    down every amazonaws.com URL (the previous registered_domain
    normalization over-blocked whole platforms from one tenant
    entry). Entries may be bare hosts, hosts with trailing dots, or
    full URLs (URLhaus form) — each normalizes to its host.

    Plan: the URL's host explodes into its dot-suffix chain (a few
    rows per URL) and anti-joins the (broadcast) entry set — a plain
    hash join; an endswith condition would be a nested loop. Rows
    with unparseable URLs (null host) are KEPT; filter
    ``url_host(col).isNotNull()`` first to quarantine them instead.
    Don't put bare TLDs ('com') in the list unless you mean them."""
    spark = df.sparkSession
    if isinstance(blocked, list):
        raw = spark.createDataFrame(
            [(d,) for d in blocked], "__blocked_raw string"
        )
    else:
        (col,) = blocked.columns
        raw = blocked.select(F.col(col).alias("__blocked_raw"))
    blocked_df = raw.select(
        _normalize_block_entry(F.col("__blocked_raw")).alias("__blocked_host")
    ).where(F.col("__blocked_host").isNotNull()).distinct()
    # blocked URL VALUES (tiny: the fraction that matches) rather
    # than blocked rows — lets the final anti-join key on the url
    # column alone instead of distinct-ing full text rows
    sufs = F.explode(
        host_suffixes(url_host(F.col(url_col)))
    ).alias("__suf")
    hit_urls = (
        df.select(F.col(url_col).alias("__u"), sufs)
        .join(
            F.broadcast(blocked_df),
            F.col("__suf") == F.col("__blocked_host"),
            "left_semi",
        )
        .select("__u")
        .distinct()
    )
    # hit_urls = the MATCHED url values only — small for any sane
    # blocklist (if a list drops half the corpus, materialize the
    # flag instead); broadcast keeps the whole path shuffle-free
    return df.join(
        F.broadcast(hit_urls), df[url_col] == hit_urls["__u"], "left_anti"
    )


def domain_counts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_docs) rollup — the corpus-composition report every
    crawl release publishes. One map-side-combinable aggregate."""
    return (
        df.select(url_domain(F.col(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
