"""CLI (__main__.py) and partitioned-sink tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _write_package(tmp_path, rows: str) -> str:
    csv = tmp_path / "data.csv"
    csv.write_text("id,grade\n" + rows)
    desc = {
        "name": "p",
        "resources": [
            {
                "name": "data",
                "path": "data.csv",
                "format": "csv",
                "schema": {
                    "fields": [
                        {"name": "id", "type": "integer",
                         "constraints": {"required": True}},
                        {"name": "grade", "type": "string",
                         "constraints": {"enum": ["A", "B"]}},
                    ],
                    "primaryKey": ["id"],
                },
            }
        ],
    }
    p = tmp_path / "datapackage.json"
    p.write_text(json.dumps(desc))
    return str(p)


def test_cli_valid_package_exit_0(spark, tmp_path, capsys):
    # the spark fixture argument guarantees the shared session exists;
    # main() adopts it (owns=False) and must NOT stop it — asserted
    # implicitly by every later test file reusing the same session
    from goodtables_pandas_py_spark.__main__ import main

    desc = _write_package(tmp_path, "1,A\n2,B\n")
    out = tmp_path / "report.json"
    rc = main([desc, "-o", str(out), "-q"])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["valid"] is True
    assert report["error-count"] == 0
    assert spark.sparkContext._jsc is not None  # session survived


def test_cli_invalid_package_exit_1_and_stdout(spark, tmp_path, capsys):
    from goodtables_pandas_py_spark.__main__ import main

    desc = _write_package(tmp_path, "1,A\n1,Z\n")  # dup PK + bad enum
    rc = main([desc, "-q", "--indent", "0"])
    assert rc == 1
    report = json.loads(capsys.readouterr().out)
    assert report["valid"] is False
    codes = {
        e["code"] for t in report["tables"] for e in t["errors"]
    }
    assert "primary-key-constraint" in codes
    assert "enumerable-constraint" in codes


def test_cli_missing_descriptor_exits_2_cleanly(
    spark, tmp_path, capsys
):
    """The DOCUMENTED exit contract: 2 = the validation itself failed
    (unreadable descriptor) — scripts must be able to distinguish
    infrastructure failure from data invalidity. Clean stderr line,
    never a traceback; the LIBRARY (gt.validate) still returns a
    report for the same input (report-not-raise is the library
    policy, the exit code is the CLI's)."""
    from goodtables_pandas_py_spark.__main__ import main

    rc = main([str(tmp_path / "nope.json"), "-q", "--indent", "0"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "cannot load descriptor" in err and "Traceback" not in err


def test_write_partitioned_prunes_partitions(spark, tmp_path):
    """Partition pruning must reach file listing: a filter on the
    partition column shows PartitionFilters in the scan and reads
    only the matching directory."""
    from goodtables_pandas_py_spark.sources import write_partitioned

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(
        ev, path, ["day"], sort_by=["user_id"], max_records_per_file=100_000
    )
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) > 1  # layout is genuinely hive-partitioned

    one_day = days[0].split("=", 1)[1]
    q = spark.read.parquet(path).where(F.col("day") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned scan must not list a second partition's directory
    n_one = q.count()
    per_day = (
        ev.groupBy("day").count().where(F.col("day") == one_day).collect()
    )
    assert n_one == per_day[0]["count"]


# --------------------------------------------- review-finding regressions

def test_cli_unreadable_descriptor_exits_2(tmp_path):
    """The documented contract: exit 2 = validation itself failed
    (previously the missing file became an invalid report -> exit 1)."""
    from goodtables_pandas_py_spark.__main__ import main

    rc = main([str(tmp_path / "nope.json")])
    assert rc == 2


def test_cli_bare_resource_json(spark, tmp_path):
    """The help text promises bare table-resource JSON works; it must
    wrap into a one-resource package with paths resolved against the
    descriptor's directory."""
    import json

    from goodtables_pandas_py_spark.__main__ import main

    (tmp_path / "t.csv").write_text("id\n1\n2\n")
    res = {
        "name": "t", "path": "t.csv",
        "schema": {"fields": [{"name": "id", "type": "integer"}]},
    }
    rp = tmp_path / "resource.json"
    rp.write_text(json.dumps(res))
    out = tmp_path / "report.json"
    rc = main([str(rp), "-o", str(out), "-q"])
    rep = json.loads(out.read_text())
    assert rc == 0 and rep["valid"] is True, rep


def test_cli_infer_then_validate_roundtrip(spark, tmp_path, capsys):
    """--infer prints a datapackage.json for a raw CSV; validating
    that descriptor over the same file comes back valid (inference
    only proposes types the sample parses cleanly)."""
    import json

    from goodtables_pandas_py_spark.__main__ import main

    csv = tmp_path / "people.csv"
    csv.write_text(
        "id,joined,score,active\n"
        "1,2024-01-02,3.5,true\n"
        "2,2024-02-03,4.25,false\n"
    )
    out = tmp_path / "dp.json"
    rc = main(["--infer", str(csv), "-o", str(out), "-q"])
    assert rc == 0
    desc = json.loads(out.read_text())
    fields = {
        f["name"]: f.get("type", "string")
        for f in desc["resources"][0]["schema"]["fields"]
    }
    assert fields["id"] == "integer"
    assert fields["joined"] == "date"
    assert fields["score"] == "number"
    assert fields["active"] == "boolean"
    rc2 = main([str(out), "-q", "--indent", "0"])
    captured = capsys.readouterr()
    assert rc2 == 0, captured.out
    assert json.loads(captured.out.strip().splitlines()[-1])["valid"] is True


def test_cli_infer_unreadable_exits_2(tmp_path):
    from goodtables_pandas_py_spark.__main__ import main

    rc = main(["--infer", str(tmp_path / "nope.csv"), "-q"])
    assert rc == 2
