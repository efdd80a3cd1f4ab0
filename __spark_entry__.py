"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``goodtables_pandas_py_spark.queries``; this
module is the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full Data Package validation of orders+lineitem at
    sf0.001 (parse + constraints + PK + FK), returned as the errors/
    summary DataFrame (SURVEY.md §7.1 M2)."""
    import goodtables_pandas_py_spark as gt
    from goodtables_pandas_py_spark.errors import Error, errors_to_spark_df

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = "/root/testdata/sf0.001"
    descriptor = {
        "name": "tpch-flagship",
        "resources": [
            {
                "name": "orders",
                "path": f"{sf_dir}/orders.parquet",
                "format": "parquet",
                "schema": {
                    "fields": [
                        {"name": "o_orderkey", "type": "integer",
                         "constraints": {"required": True, "unique": True}},
                        {"name": "o_custkey", "type": "integer",
                         "constraints": {"required": True}},
                        {"name": "o_orderstatus", "type": "string",
                         "constraints": {"enum": ["F", "P", "O"]}},
                        {"name": "o_totalprice", "type": "number",
                         "constraints": {"minimum": 0}},
                        {"name": "o_orderdate", "type": "datetime"},
                        {"name": "o_orderpriority", "type": "string",
                         "constraints": {"pattern": "[1-5]-[A-Z ]+"}},
                    ],
                    "primaryKey": ["o_orderkey"],
                },
            },
            {
                "name": "lineitem",
                "path": f"{sf_dir}/lineitem.parquet",
                "format": "parquet",
                "schema": {
                    "fields": [
                        {"name": "l_orderkey", "type": "integer",
                         "constraints": {"required": True}},
                        {"name": "l_partkey", "type": "integer"},
                        {"name": "l_suppkey", "type": "integer"},
                        {"name": "l_linenumber", "type": "integer"},
                        {"name": "l_quantity", "type": "number",
                         "constraints": {"minimum": 0, "maximum": 50}},
                        {"name": "l_extendedprice", "type": "number"},
                        {"name": "l_discount", "type": "number",
                         "constraints": {"minimum": 0, "maximum": 0.1}},
                        {"name": "l_tax", "type": "number"},
                        {"name": "l_returnflag", "type": "string",
                         "constraints": {"enum": ["N", "A", "R"]}},
                        {"name": "l_linestatus", "type": "string",
                         "constraints": {"enum": ["O", "F"]}},
                        {"name": "l_shipdate", "type": "datetime"},
                    ],
                    "foreignKeys": [
                        {"fields": ["l_orderkey"],
                         "reference": {"resource": "orders",
                                       "fields": ["o_orderkey"]}}
                    ],
                },
            },
        ],
    }
    report = gt.validate(spark, descriptor)
    errors = [
        Error(
            code=e.get("code", ""),
            resource=tbl["source"],
            field=e.get("field"),
            constraint=str(e.get("constraint")) if e.get("constraint") else None,
            values=e.get("values", []),
            count=e.get("count", 0),
        )
        for tbl in report["tables"]
        for e in tbl["errors"]
    ]
    # always ≥1 row: per-table summary rows ride along with any errors
    summaries = [
        Error(
            code="summary",
            resource=tbl["source"],
            constraint="valid" if tbl["valid"] else "invalid",
            count=tbl["row-count"],
        )
        for tbl in report["tables"]
    ]
    return errors_to_spark_df(spark, summaries + errors)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (IDs in the
    query names: p*=parsers, c*=constraints, k*=keys, a/w=agg/window,
    x*=extensions, dq=flagship summary)."""
    from goodtables_pandas_py_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (absent → rows-only check for
    hash-based / approximate operators)."""
    from goodtables_pandas_py_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
