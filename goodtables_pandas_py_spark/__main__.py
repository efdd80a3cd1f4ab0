"""Command-line entry point: validate a Frictionless data package and
print (or write) the JSON report.

    python -m goodtables_pandas_py_spark path/to/datapackage.json
    python -m goodtables_pandas_py_spark desc.json -o report.json -q

Mirrors the reference workflow's terminal usage (SURVEY.md §3: the
reference is driven as `validate(source)` from scripts; the
frictionless tooling it plugs into ships a `goodtables` CLI with the
same exit-code contract). Exit codes: 0 = valid, 1 = invalid
(validation ran, errors found), 2 = the validation itself failed
(unreadable descriptor, etc.).

Spark-first note: the CLI is a thin driver — all work happens in
:func:`goodtables_pandas_py_spark.validate`, which compiles the whole
package into fused single-scan Spark jobs. ``--master`` lets an
operator point the same command at a real cluster
(``--master spark://...`` / ``yarn``) without code changes.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m goodtables_pandas_py_spark",
        description="Validate a Frictionless data package on Spark.",
    )
    p.add_argument(
        "descriptor",
        help="path to datapackage.json (or a bare table-resource JSON)",
    )
    p.add_argument(
        "-o", "--output",
        help="write the JSON report here instead of stdout",
    )
    p.add_argument(
        "--master",
        default=None,
        help="Spark master (default: local[$SPARK_GRAFT_CPUS])",
    )
    p.add_argument(
        "--indent", type=int, default=2,
        help="report JSON indent (default 2; 0 = compact)",
    )
    p.add_argument(
        "-q", "--quiet", action="store_true",
        help="suppress the one-line summary on stderr",
    )
    p.add_argument(
        "--infer", action="store_true",
        help="treat the argument as a DATA file (csv/parquet/orc/"
        "ndjson) and print an inferred datapackage.json instead of "
        "validating — the authoring companion to the validate mode",
    )
    p.add_argument(
        "--sample-rows", type=int, default=10_000,
        help="rows sampled for --infer type proposal (default 10000)",
    )
    return p


def _acquire_spark(app_name: str, master: str | None):
    """Return ``(spark, owns)``: adopt a live session when one exists
    (``owns=False`` — the CLI must NOT stop a session it did not
    create, e.g. when ``main()`` is called programmatically inside a
    host application or a test harness), else build one via
    :func:`get_spark` (``owns=True`` — the CLI stops it on exit)."""
    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is None:
        # getActiveSession is per-thread; fall back to the
        # process-wide default session if another thread made one
        existing = getattr(SparkSession, "_instantiatedSession", None)
    if existing is not None and existing.sparkContext._jsc is not None:
        return existing, False

    import goodtables_pandas_py_spark as gt

    return gt.get_spark(app_name=app_name, master=master), True


def infer_main(args) -> int:
    """--infer: data file -> inferred datapackage.json on stdout/-o.
    The emitted descriptor validates the same file cleanly by
    construction (inference only proposes a type when the sample
    parses without errors) — tested end-to-end in test_cli."""
    import os

    from goodtables_pandas_py_spark.inference import infer_schema
    from goodtables_pandas_py_spark.schema import Resource
    from goodtables_pandas_py_spark.sources import read_resource, stringly

    name = os.path.splitext(os.path.basename(args.descriptor))[0]
    spark, owns = _acquire_spark("goodtables-infer", args.master)
    try:
        res = Resource.from_descriptor(
            {"name": name, "path": os.path.abspath(args.descriptor)}
        )
        df = stringly(read_resource(spark, res))
        schema = infer_schema(df, sample_rows=args.sample_rows)
        desc = {
            "name": name,
            "resources": [
                {
                    "name": name,
                    "path": args.descriptor,
                    **({"format": res.format} if res.format else {}),
                    "schema": schema.to_descriptor(),
                }
            ],
        }
    except Exception as exc:
        print(f"error: cannot infer schema: {exc}", file=sys.stderr)
        return 2
    finally:
        if owns:
            spark.stop()

    indent = args.indent if args.indent > 0 else None
    text = json.dumps(desc, indent=indent)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    if not args.quiet:
        types = ", ".join(
            f"{f.name}:{f.type}" for f in schema.fields
        )
        print(f"inferred {len(schema.fields)} field(s): {types}",
              file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.infer:
        return infer_main(args)

    # pre-load driver-side (no Spark): an unreadable descriptor is an
    # INFRASTRUCTURE failure and must exit 2 per the documented
    # contract — validate() would convert it into an invalid report
    # (exit 1), making missing-file indistinguishable from bad data
    import os

    from goodtables_pandas_py_spark.schema import load_descriptor

    try:
        desc, base_dir = load_descriptor(args.descriptor)
    except Exception as exc:
        print(f"error: cannot load descriptor: {exc}", file=sys.stderr)
        return 2
    if "resources" not in desc and ("path" in desc or "data" in desc):
        # bare table-resource JSON: wrap into a one-resource package,
        # resolving its relative path against the descriptor's dir
        # (the wrap loses the file-derived base_dir otherwise)
        res = dict(desc)
        rp = res.get("path")
        if isinstance(rp, str) and not os.path.isabs(rp) and "://" not in rp:
            res["path"] = os.path.join(base_dir, rp)
        desc = {"name": res.get("name", "resource"), "resources": [res]}
    elif not isinstance(args.descriptor, dict):
        # keep path-relative resolution by passing the original source
        desc = args.descriptor

    import goodtables_pandas_py_spark as gt

    spark, owns = _acquire_spark("goodtables-cli", args.master)
    try:
        report = gt.validate(spark, desc)
    except Exception as exc:  # engine failure
        print(f"error: {exc}", file=sys.stderr)
        return 2
    finally:
        if owns:
            spark.stop()

    indent = args.indent if args.indent > 0 else None
    text = json.dumps(report, indent=indent, default=str)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    if not args.quiet:
        status = "valid" if report.get("valid") else "INVALID"
        print(
            f"{status}: {report.get('table-count', 0)} table(s), "
            f"{report.get('error-count', 0)} error(s)",
            file=sys.stderr,
        )
    return 0 if report.get("valid") else 1


if __name__ == "__main__":
    sys.exit(main())
