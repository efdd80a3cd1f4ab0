#!/usr/bin/env python
"""Optimization survey (guide §1): time every registry query with the
noop sink and capture its .explain("formatted") plan.

For each ``__spark_entry__.queries()`` entry at a given SF:
- t_build  — seconds to CALL the builder (side-effectful queries — the
  release/vecindex lifecycles — do their real work here; pure queries
  only pay analysis);
- t_noop   — per-rep seconds for ``df.write.format("noop")`` (computes
  every column of every row, § 1.4), reps interleaved is unnecessary
  here because this tool is for RELATIVE ranking, not the headline;
- the formatted plan, written to ``plans/r11/<name>_<tag>.txt``;
- plan-shape counters: Exchange / SortMergeJoin / BroadcastHashJoin /
  BatchEvalPython / ArrowEvalPython / MapInPandas / CartesianProduct.

Usage:
    python tools/opt_survey.py [--sf SF_DIR] [--tag before|after]
                               [--reps N] [--plans-only] [query ...]

Prints one JSON line per query and a final summary line, and appends
everything to ``plans/r11/survey_<tag>.jsonl``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLAN_MARKS = [
    ("exchange", r"\bExchange\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("batch_py", r"\bBatchEvalPython\b"),
    ("arrow_py", r"\bArrowEvalPython\b"),
    ("map_pandas", r"\bMapInPandas\b|\bFlatMapGroupsInPandas\b|\bFlatMapCoGroupsInPandas\b"),
    ("aqe", r"\bAdaptiveSparkPlan\b"),
]


def plan_shape(plan: str) -> dict:
    return {k: len(re.findall(p, plan)) for k, p in PLAN_MARKS}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--round", default="r12")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    import goodtables_pandas_py_spark as gt

    spark = gt.get_spark(app_name="opt-survey", quiet_logs=True)
    plans_dir = os.path.join(REPO, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)
    out_path = os.path.join(plans_dir, f"survey_{args.tag}.jsonl")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    results = {}
    with open(out_path, "a") as out:
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"survey:{name}:build")
            rec: dict = {"query": name, "sf": args.sf, "tag": args.tag}
            try:
                t0 = time.time()
                df = fn(spark, args.sf)
                rec["t_build"] = round(time.time() - t0, 3)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
                rec["shape"] = plan_shape(plan)
                if not args.plans_only:
                    noop = []
                    for i in range(args.reps):
                        spark.sparkContext.setJobDescription(
                            f"survey:{name}:noop{i}"
                        )
                        t0 = time.time()
                        df.write.format("noop").mode("overwrite").save()
                        noop.append(round(time.time() - t0, 3))
                    rec["t_noop"] = noop
                    rec["t_noop_min"] = min(noop)
            except Exception:
                rec["err"] = traceback.format_exc(limit=5).splitlines()[-1]
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            results[name] = rec
    total = sum(r.get("t_noop_min", 0) for r in results.values())
    summary = {
        "summary": True,
        "tag": args.tag,
        "n": len(results),
        "errs": [n for n, r in results.items() if "err" in r],
        "t_noop_total": round(total, 3),
        "t_build_total": round(
            sum(r.get("t_build", 0) for r in results.values()), 3
        ),
    }
    print(json.dumps(summary), flush=True)
    with open(out_path, "a") as out:
        out.write(json.dumps(summary) + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
