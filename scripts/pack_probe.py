"""Funnel probe for sequence packing: unbucketed vs bucketed at
volume (VERDICT r9 next-round #2's measurement half).

pack_sequences' per-lang prefix sum is a serial funnel by contract —
the whole dominant language flows through ONE window task. The
bucketed operator subdivides the key; the plan-level evidence
(Exchange hashes on (lang, bucket)) is pinned by
tests/test_pack_sequences.py — this probe adds the measured delta on
the x-scaled perf fixture (scripts/scale_probe.py derivation,
decorrelated document replicas), same-session interleaved med-of-3
per size so machine drift cancels.

Usage: python scripts/pack_probe.py [out_json] [factors_csv] [n_buckets]
Defaults: factors 16,64; n_buckets 32.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pack_probe.json"
    factors = ([int(x) for x in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [16, 64])
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    os.environ.setdefault("SPARK_GRAFT_PROBE_TABLES", "documents")
    from scale_probe import build_fixture  # noqa: E402

    from etl_work_flow_for_big_data_spark.functions.text import token_count
    from etl_work_flow_for_big_data_spark.operators.transforms import (
        pack_sequences,
    )
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("pack-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    record: dict = {"n_buckets": n_buckets}
    for k in factors:
        fix_dir = f"/tmp/spark_graft_scale_x{k}"
        build_fixture(spark, k, fix_dir)
        d = spark.read.parquet(os.path.join(fix_dir, "documents.parquet"))
        t = d.select(
            "doc_id", "lang",
            token_count(F.col("text")).cast("int").alias("n_tokens"),
        )

        def run(bucketed: bool) -> float:
            t0 = time.perf_counter()
            df = pack_sequences(t, n_buckets=n_buckets if bucketed else None)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        run(False), run(True)  # warm both plans
        flat, buck = [], []
        for _ in range(3):
            flat.append(run(False))
            buck.append(run(True))
        record[f"x{k}"] = {
            "rows": d.count(),
            "unbucketed_med3": round(statistics.median(flat), 2),
            "bucketed_med3": round(statistics.median(buck), 2),
        }
        print(f"x{k}: {record[f'x{k}']}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
