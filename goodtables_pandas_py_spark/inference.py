"""Table Schema inference (SURVEY.md §1.4 — optional sugar mirroring
the frictionless ecosystem's ``tableschema.infer``; the public
reference relies on declared schemas, so inference here is a
convenience for schema-less resources, NOT ``spark.read`` type
inference — it proposes *Table Schema logical types* by running the
engine's own parsers.

Plan shape: candidate types are tried with the SAME compiled parser
expressions the validator uses, all columns × all candidates fused
into ONE aggregate over a bounded sample — a single scan-limited job,
no per-candidate passes, no driver-side value inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parsers import parse_field
from .schema import Field, TableSchema

#: candidate order: narrowest first; first candidate with zero parse
#: failures (and ≥1 parsed value) wins. ``integer`` ranks before
#: ``boolean`` so "1"/"0" columns stay numeric (the boolean vocabulary
#: includes them), and ``year`` is subsumed by ``integer`` — both
#: matching frictionless inference practice; ``string`` is the
#: fallback.
CANDIDATES: list[tuple[str, str]] = [
    ("integer", "default"),
    ("number", "default"),
    ("boolean", "default"),
    ("date", "default"),
    ("time", "default"),
    ("datetime", "default"),
    ("yearmonth", "default"),
    ("duration", "default"),
    ("geopoint", "default"),
    ("array", "default"),
    ("object", "default"),
]


def infer_schema(
    df: DataFrame,
    sample_rows: int = 10_000,
    missing_values: list[str] | None = None,
) -> TableSchema:
    """Propose a TableSchema for an all-string DataFrame.

    One job: ``limit(sample_rows)`` → a single wide aggregate with
    (n_bad, n_parsed) per column × candidate. The limit makes the scan
    early-terminating, so inference cost is bounded by the sample, not
    the table — at 100 TB this reads a handful of parquet row groups.
    """
    mv = [""] if missing_values is None else missing_values
    sample = df.limit(sample_rows)

    aggs = []
    for col in df.columns:
        for i, (typ, fmt) in enumerate(CANDIDATES):
            fld = Field(col, type=typ, format=fmt)
            pf = parse_field(F.col(col), fld, mv)
            aggs.append(F.count_if(pf.bad).alias(f"__bad__{col}__{i}"))
            aggs.append(
                F.count_if(pf.parsed.isNotNull()).alias(f"__ok__{col}__{i}")
            )
    row = sample.agg(*aggs).first().asDict()

    fields = []
    for col in df.columns:
        chosen = Field(col, type="string")
        for i, (typ, fmt) in enumerate(CANDIDATES):
            if row[f"__bad__{col}__{i}"] == 0 and row[f"__ok__{col}__{i}"] > 0:
                chosen = Field(col, type=typ, format=fmt)
                break
        fields.append(chosen)
    return TableSchema(fields=fields, missing_values=mv)
