"""Capture .explain("formatted") for every registered query into
plans/<tag>/<query>_<suffix>.txt plus a one-line-per-query plan-shape
summary (Exchange count, join strategies, Python eval nodes, scan
pushdown) on stdout.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
  tag     e.g. r14 -> writes under plans/r14/
  suffix  e.g. before / after
  query   optional subset; default = all registered queries

Plan-only: builds each DataFrame and formats the physical plan without
executing it (explain is driver-side), so this is safe to run while
other jobs own the executors.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_work_flow_for_big_data_spark.queries import load_all  # noqa: E402
from etl_work_flow_for_big_data_spark.session import get_spark  # noqa: E402


def shape_summary(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "Cartesian": len(re.findall(r"CartesianProduct", plan)),
        "Sort": len(re.findall(r"\bSort\b", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
        "PyEval": len(re.findall(r"(?:BatchEvalPython|ArrowEvalPython)", plan)),
        "MapInPandas": len(re.findall(r"(?:MapInPandas|MapInArrow|FlatMapGroupsInPandas)", plan)),
        "Scan": len(re.findall(r"Scan parquet", plan)),
        "Generate": len(re.findall(r"\bGenerate\b", plan)),
        "TakeOrdered": len(re.findall(r"TakeOrderedAndProject", plan)),
    }
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    parts = [f"{k}={v}" for k, v in counts.items() if v]
    parts.append(f"PushedFilterScans={pushed}")
    return " ".join(parts)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    todo = names or sorted(registry)
    for name in todo:
        spec = registry[name]
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture harness
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {shape_summary(plan)}")


if __name__ == "__main__":
    main()
