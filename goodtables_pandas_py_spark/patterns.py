"""Lexical pattern constants + strptime→Spark-datetime-pattern compiler.

SURVEY.md §2.3 P2-P5 (string-format regexes) and P10 (pattern
translation). The reference validates formats with Python ``re`` /
``strptime`` ([R parse.py::parse_string, parse_date]); we compile the
same patterns to JVM-side Spark constructs so no Python UDF runs in the
hot path.
"""

from __future__ import annotations

# --- string-format regexes (Java regex dialect, used in rlike) -----------

# Pragmatic email check (reference uses a similar single-regex validity
# test, [R parse.py::parse_string]): local@domain.tld, no spaces.
EMAIL_RE = r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$"

# RFC 3986-ish: scheme ':' non-space remainder (mailto: has no '//').
URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]+$"

UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

# base64 body; length%4 check done separately (P5).
BASE64_RE = r"^[A-Za-z0-9+/]*={0,2}$"

INTEGER_RE = r"^[+-]?[0-9]+$"

# number after groupChar/decimalChar normalization; allows exponent and
# leading/trailing dot like pandas to_numeric ('.5', '5.').
NUMBER_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
NUMBER_SPECIALS = {"NaN": float("nan"), "INF": float("inf"), "-INF": float("-inf")}

YEAR_RE = r"^-?[0-9]{4}$"
YEARMONTH_RE = r"^[0-9]{4}-(0[1-9]|1[0-2])$"

# ISO 8601 duration PnYnMnWnDTnHnMnS [SPEC table-schema §duration]
DURATION_RE = (
    r"^P(?!$)([0-9]+Y)?([0-9]+M)?([0-9]+W)?([0-9]+(?:\.[0-9]+)?D)?"
    r"(T(?!$)([0-9]+H)?([0-9]+M)?([0-9]+(?:\.[0-9]+)?S)?)?$"
)

DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
TIME_RE = r"^[0-9]{2}:[0-9]{2}:[0-9]{2}$"

GEOJSON_TYPES = [
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "GeometryCollection",
    "Feature",
    "FeatureCollection",
]
TOPOJSON_TYPES = ["Topology"]

# --- strptime → Spark (java.time) datetime pattern compiler (P10) --------

# Spark 'CORRECTED' parser uses DateTimeFormatter patterns.
_STRPTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    # optional-section pair accepts BOTH '+02:30' and '+0230' (and
    # Z) — Python strptime takes both; bare 'XX' rejected the colon
    # form while the guard regex accepted it
    "%z": "[XXX][XX]",
    "%Z": "zzz",
    "%p": "a",
    "%j": "DDD",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%%": "%",
}

def strptime_to_spark(fmt: str) -> str:
    """Translate a strptime pattern (what Table Schema descriptors use)
    to a Spark/java.time datetime pattern. Raises on directives with no
    Spark equivalent so callers can fall back to the UDF path."""
    out: list[str] = []
    i = 0
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            text = "".join(literal)
            # every ASCII letter is reserved in java.time patterns
            if any(c.isalpha() for c in text) or "'" in text:
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            literal.clear()

    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling % in pattern {fmt!r}")
            directive = fmt[i : i + 2]
            if directive not in _STRPTIME_TO_SPARK:
                raise ValueError(f"unsupported strptime directive {directive!r}")
            flush_literal()
            out.append(_STRPTIME_TO_SPARK[directive])
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush_literal()
    return "".join(out)


def two_digit_year_correction(ts, fmt: str):
    """Python strptime pivots 2-digit years at 69 (69-99 → 1969-1999,
    00-68 → 2000-2068); java.time 'yy' uses base 2000 (69 → 2069).
    When ``fmt`` uses %y (and not %Y), shift parsed years ≥ 2069 back
    a century so the Spark parse agrees with the reference semantics.
    Column-level, codegen-friendly; no-op for other formats."""
    from pyspark.sql import functions as F

    if "%y" not in fmt or "%Y" in fmt:
        return ts
    return F.when(
        F.year(ts) >= 2069, ts - F.expr("INTERVAL 100 YEARS")
    ).otherwise(ts)
