#!/usr/bin/env python
"""Nightly drift-monitoring example, runnable against the bundled
testdata:

    python examples/drift_monitoring.py [before_dir] [after_dir] [out_dir]

The workflow a 100 TB pipeline runs between ingestion batches:

1. PROFILE each snapshot in ONE scan (`column_profile`) and persist
   the tiny profile frame next to the data — profiles are a few rows
   per table, so keeping every night's profile is free.
2. COMPARE tonight's profile against the last one (`profile_drift`):
   moment-based flags (null-rate, mean shift, distinct ratio, row
   count, schema add/remove) at a cost independent of table size.
3. For columns worth a closer look, HISTOGRAM both snapshots over
   the SAME bounds (from the before-profile) and compute PSI —
   the standard population-shift score.
4. GATE: exit non-zero when anything drifts, so the scheduler can
   block downstream training-data releases.

Here the two "snapshots" are sf0.001 vs sf0.01 of the same generator:
row counts scale 10x (row_count_drift fires — demonstrating the
gate), value distributions are stable (mean flags stay quiet), and
key-id domains legitimately shift (their means flag — upstream id
reallocation is exactly the kind of silent change worth surfacing).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import goodtables_pandas_py_spark as gt
from goodtables_pandas_py_spark.extensions.profiling import (
    column_profile,
    population_stability_index,
    profile_drift,
    value_histogram,
)


def main() -> int:
    before_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    after_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/drift_out"

    spark = gt.get_spark(app_name="drift-monitor")
    table = "lineitem"
    before = spark.read.parquet(f"{before_dir}/{table}.parquet")
    after = spark.read.parquet(f"{after_dir}/{table}.parquet")

    # 1. profile each snapshot once; persist for the audit trail
    p_before = column_profile(before)
    p_after = column_profile(after)
    p_after.write.mode("overwrite").parquet(f"{out}/{table}_profile.parquet")

    # 2. drift report
    drift = profile_drift(p_before, p_after).collect()
    drifted = [r for r in drift if r["drifted"]]
    for r in drift:
        flags = [
            k for k in ("null_rate_drift", "mean_drift", "distinct_drift",
                        "row_count_drift")
            if r[k]
        ] + ([f"schema:{r['schema_change']}"] if r["schema_change"] else [])
        print(f"  {r['column']:<18} {'DRIFT ' + ','.join(flags) if flags else 'ok'}")

    # 3. PSI for a value column, bounds pinned from the BEFORE profile
    stats = {r["column"]: r for r in p_before.collect()}
    col = "l_extendedprice"
    lo, hi = stats[col]["min_v"], stats[col]["max_v"]
    psi = population_stability_index(
        value_histogram(before, col, lo, hi, bins=20),
        value_histogram(after, col, lo, hi, bins=20),
    )
    print(f"PSI({col}) = {psi:.4f}  "
          f"({'stable' if psi < 0.1 else 'shifted' if psi < 0.25 else 'changed'})")

    report = {
        "table": table,
        "n_columns": len(drift),
        "n_drifted": len(drifted),
        "drifted": [r["column"] for r in drifted],
        "psi": {col: psi},
    }
    os.makedirs(out, exist_ok=True)
    with open(f"{out}/drift_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {out}/drift_report.json")
    spark.stop()
    # 4. gate
    return 1 if drifted else 0


if __name__ == "__main__":
    raise SystemExit(main())
