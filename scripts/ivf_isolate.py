"""Isolate the sim_ivf_* family: run each query N times in one session
(noop sink, labeled jobs), print per-run wall times. Usage:
python scripts/ivf_isolate.py [n_runs] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_work_flow_for_big_data_spark.queries import load_all  # noqa: E402
from etl_work_flow_for_big_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or [
        "sim_ivf_topk",
        "sim_ivf_nprobe",
        "sim_ivf_persisted",
        "sim_ivf_persisted_nprobe",
        "sim_ivf_trained",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ivf-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    from etl_work_flow_for_big_data_spark.catalog import TABLES, load_table

    for t in TABLES:
        _ = load_table(spark, sf_dir, t).schema

    def _ident(it):
        yield from it

    n_slots = spark.sparkContext.defaultParallelism
    spark.range(n_slots, numPartitions=n_slots).mapInPandas(
        _ident, "id long"
    ).write.mode("overwrite").format("noop").save()

    for name in names:
        spec = registry[name]
        runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {runs}")


if __name__ == "__main__":
    main()
