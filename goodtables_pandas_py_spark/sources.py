"""Sources / sinks S1-S3 (SURVEY.md §2.1).

The reference reads CSV with pandas, all columns as ``str`` and
NA-filtering disabled, so the lexical form survives for parsing
([R validate.py::validate] — the core design, SURVEY.md §1.1 D5). Our
equivalent: ``spark.read.csv`` with an explicit all-StringType schema
(never ``inferSchema``) and nulls disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import Dialect, Resource


def read_csv_stringly(
    spark: SparkSession,
    path: str,
    dialect: Dialect | None = None,
    encoding: str = "utf-8",
    column_names: list[str] | None = None,
) -> DataFrame:
    """S2: read a CSV with every column as a string and no NA
    interpretation (missing-values mapping happens later, per schema).

    When ``column_names`` is given the file schema is pinned (scan
    stays schema-checked and codegen-friendly); otherwise one header
    sniff drives the column list.
    """
    d = dialect or Dialect()
    reader = (
        spark.read.option("header", d.header)
        .option("sep", d.delimiter)
        .option("quote", d.quote_char)
        # multiLine makes CSV non-splittable (one task per file) —
        # only when the dialect declares embedded newlines
        .option("multiLine", d.multiline)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        # keep lexical forms: no implicit nulls or type coercion
        .option("nullValue", "\u0001NEVER_A_NULL\u0001")
        .option("emptyValue", "")
        .option("inferSchema", False)
    )
    if d.escape_char:
        reader = reader.option("escape", d.escape_char)
    elif d.double_quote:
        reader = reader.option("escape", '"')
    if d.skip_initial_space:
        reader = reader.option("ignoreLeadingWhiteSpace", True)
    if d.line_terminator not in ("\r\n", "\n", "\r"):
        # Spark auto-detects the standard terminators; only exotic
        # single-char terminators need an explicit lineSep
        reader = reader.option("lineSep", d.line_terminator[:1])
    if column_names is not None:
        schema = T.StructType([T.StructField(c, T.StringType()) for c in column_names])
        return reader.schema(schema).csv(path)
    df = reader.csv(path)
    # header=True + no schema yields all-string columns already
    return df


def sniff_csv_header(
    spark: SparkSession,
    path: str,
    dialect: Dialect | None = None,
    encoding: str = "utf-8",
) -> list[str] | None:
    """Recover the TRUE header row of a CSV. ``spark.read.csv``
    auto-renames duplicate header names (a,a → a0,a1) and blank ones
    (→ _cN), which would blind the H1 duplicate-header/blank-header
    checks — so H1 must compare against the raw first line, parsed
    with the dialect. Bounded work: one line, local file read or a
    LIMIT-1 text scan."""
    import csv
    import io
    import os

    d = dialect or Dialect()
    if not d.header:
        return None
    line: str | None = None
    if os.path.isfile(path):
        with open(path, encoding=encoding, newline="") as fh:
            line = fh.readline()
    else:  # glob / directory / remote: one-row text scan (utf-8)
        first = spark.read.text(path).limit(1).first()
        line = first[0] if first else ""
    reader = csv.reader(
        io.StringIO(line),
        delimiter=d.delimiter,
        quotechar=d.quote_char,
        escapechar=d.escape_char or None,
        doublequote=d.double_quote,
        skipinitialspace=d.skip_initial_space,
    )
    return next(reader, [])


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3: typed parquet resource — our primary test path
    (TESTDATA.md). Columnar scan; Catalyst prunes columns/predicates."""
    return spark.read.parquet(path)


def read_inline(spark: SparkSession, resource: Resource) -> DataFrame:
    """Inline ``data`` resources [SPEC data-package §resource.data]:
    array of objects, or array of arrays whose first row is the header
    (when dialect.header). Rendered all-string like the CSV path so
    the identical parse pipeline applies. Inline data is descriptor-
    sized by definition — driver-side construction is correct here."""
    data = resource.data
    if not isinstance(data, list) or not data:
        raise ValueError(f"resource {resource.name!r}: inline data must be a non-empty list")
    if isinstance(data[0], dict):
        columns: list[str] = []
        for row in data:
            for k in row:
                if k not in columns:
                    columns.append(k)
        rows = [tuple(_lex(row.get(c)) for c in columns) for row in data]
    else:
        if resource.dialect.header:
            columns = [str(c) for c in data[0]]
            body = data[1:]
        else:
            columns = [f"field{i + 1}" for i in range(len(data[0]))]
            body = data
        rows = [tuple(_lex(v) for v in row) for row in body]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
    return spark.createDataFrame(rows, schema)


def _lex(v) -> str | None:
    """Lexical render of an inline value (JSON-ish scalars)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def read_resource(spark: SparkSession, resource: Resource) -> DataFrame:
    if resource.data is not None:
        return read_inline(spark, resource)
    if resource.path is None:
        raise ValueError(f"resource {resource.name!r} has no path")
    fmt = (resource.format or "csv").lower()
    if fmt == "parquet":
        return read_parquet(spark, resource.path)
    if fmt == "csv":
        # do NOT pin schema field names: header mismatches must be
        # observed by H1, so the file's own header drives the columns
        return read_csv_stringly(
            spark, resource.path, resource.dialect, resource.encoding
        )
    raise ValueError(f"unsupported resource format {fmt!r}")


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition only when the source yields far fewer partitions
    than the session's parallelism (e.g. single-row-group parquet
    files, which Spark cannot split below one task per row group).
    At real scale (partitions >> cores) this is a no-op, so no shuffle
    is added where it would hurt; on under-split inputs the one cheap
    round-robin shuffle unlocks full-width execution for everything
    downstream."""
    spark = df.sparkSession
    if target is None:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    current = df.rdd.getNumPartitions()
    if current * 2 <= target:
        return df.repartition(target)
    return df


def stringly(df: DataFrame) -> DataFrame:
    """Render a typed DataFrame lexically (every column cast to
    string) — lets the parser/validation pipeline run against typed
    sources exactly as it would against CSV text. Dates/timestamps use
    ISO forms matching Table Schema defaults."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.DateType):
            cols.append(F.date_format(c, "yyyy-MM-dd").alias(f.name))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            cols.append(F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss").alias(f.name))
        else:
            cols.append(c.cast(T.StringType()).alias(f.name))
    return df.select(*cols)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: list[str],
    num_buckets: int = 32,
    path: str | None = None,
) -> DataFrame:
    """Bucketed sink (SURVEY.md §4.3.3 scale path): tables bucketed on
    the same key with the same bucket count join/aggregate WITHOUT a
    shuffle — the hash partitioning is baked into the files, so at
    100 TB repeated FK checks or dedup passes pay the shuffle once at
    write time, never per query. Sorted within buckets so merge joins
    skip the sort too. Returns the catalog-backed DataFrame."""
    writer = (
        df.write.bucketBy(num_buckets, *key)
        .sortBy(*key)
        .mode("overwrite")
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)
