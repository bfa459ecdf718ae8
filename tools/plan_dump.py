#!/usr/bin/env python
"""Dump .explain("formatted") for every bench headline query into
plans/<tag>/<query>_<suffix>.txt plus a one-line-per-query JSON of
plan-shape metrics (Exchange count, join strategies, python-eval
nodes, pushed filters) to plans/<tag>/plan_metrics_<suffix>.json.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]
  tag     e.g. r11  (directory plans/r11/)
  suffix  e.g. before | after
  query   optional subset; default = every bench.py HEADLINE query

The dump is the STATIC plan (AdaptiveSparkPlan isFinalPlan=false) —
deterministic and runnable without executing the query, which is what
a plan-diff needs. Runtime AQE decisions are audited separately where
they matter (see OPTIMIZATION notes).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_NODE_RE = re.compile(
    r"\b(Exchange|BroadcastExchange|SortMergeJoin|BroadcastHashJoin|"
    r"ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct|"
    r"BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow|"
    r"FlatMapGroupsInPandas|WholeStageCodegen|AQEShuffleRead|Sort|"
    r"Window|HashAggregate|SortAggregate|ObjectHashAggregate)\b"
)


def plan_metrics(text: str) -> dict:
    counts: dict[str, int] = {}
    for m in PLAN_NODE_RE.finditer(text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    read_schema = re.findall(r"ReadSchema: ([^\n]*)", text)
    return {
        "nodes": counts,
        "pushed_filters": [p for p in pushed if p.strip()],
        "n_scans": len(read_schema),
        "read_schema_widths": [s.count(",") + 1 for s in read_schema],
    }


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])

    from bench import HEADLINE
    from kinesis_analytics_demo_spark.caching import release_tracked
    from kinesis_analytics_demo_spark.plans.registry import all_queries
    from kinesis_analytics_demo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="kads-plan-dump")
    specs = all_queries()
    names = [n for n in HEADLINE if not only or n in only] + sorted(
        n for n in only if n not in HEADLINE
    )
    metrics: dict[str, dict] = {}
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        text = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        metrics[name] = plan_metrics(text)
        release_tracked(blocking=False)
        print(f"{name}: {json.dumps(metrics[name]['nodes'])}", flush=True)
    with open(os.path.join(out_dir, f"plan_metrics_{suffix}.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
