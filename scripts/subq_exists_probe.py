"""subquery_exists growth attribution (VERDICT r13 #6 watch item).

The slope sweep reads alpha_tail 0.48 (r12) -> 0.61 (r13) for
subquery_exists with ~1.9 s absolute at ~sf0.5. Before escalating to
a strategy change, attribute WHERE the growth lives: the query is
scan(orders) + scan(lineitem pruned to 2 cols) + left-semi SMJ with
the ship>order residual + a 5-group agg. This probe times, at
x1/x5/x10 of sf0.1 (decorrelated scale_probe fixtures), lower-median
of 3 in one session:

- full:      the registered query, unchanged;
- scans:     both pruned scans materialized to noop (no join) — the
             data-ingest floor;
- semi_join: scans + the semi join, no agg (the agg is 5 groups —
             free) — full minus scans isolates the join's share.

Per-component alpha_tail (x5 -> x10) says whether growth is the scan
(expected ~linear, irreducible) or the join (would indicate shuffle /
spill pressure worth a strategy change).

Usage: python scripts/subq_exists_probe.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTORS = [1, 5, 10]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/subq_exists_probe.json"
    from scale_probe import build_fixture

    from etl_work_flow_for_big_data_spark.catalog import load_table, maybe_merge
    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("subq-exists-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    os.environ["SPARK_GRAFT_PROBE_TABLES"] = "orders,lineitem"
    dirs = {}
    for k in FACTORS:
        d = f"/tmp/subq_probe_x{k}"
        build_fixture(spark, k, d)
        dirs[k] = d

    from pyspark.sql import functions as F

    def _noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def variants(sf_dir):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate")
        o2 = load_table(spark, sf_dir, "orders")
        li2 = maybe_merge(
            load_table(spark, sf_dir, "lineitem"), sf_dir, "lineitem")
        sem = o2.join(
            li2,
            (o2.o_orderkey == li2.l_orderkey)
            & (li2.l_shipdate > o2.o_orderdate),
            "left_semi",
        )
        return {
            "full": lambda: registry["subquery_exists"].fn(spark, sf_dir),
            "scans": lambda: o.unionByName(
                li.select(
                    F.col("l_orderkey").alias("o_orderkey"),
                    F.col("l_shipdate").alias("o_orderdate"),
                ).withColumn("o_orderpriority", F.lit(None).cast("string"))
            ),
            "semi_join": lambda: sem,
        }

    # warm
    for fn in variants(dirs[1]).values():
        _noop(fn())

    out: dict = {"factors": FACTORS, "components": {}}
    for k in FACTORS:
        vs = variants(dirs[k])
        for name, fn in vs.items():
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                _noop(fn())
                runs.append(time.perf_counter() - t0)
            med = sorted(runs)[(len(runs) - 1) // 2]
            out["components"].setdefault(name, {})[str(k)] = round(med, 3)
            print(f"x{k} {name}: {med:.3f}s", file=sys.stderr)

    for name, times in out["components"].items():
        t5, t10 = times["5"], times["10"]
        times["alpha_tail"] = round(
            math.log(max(t10, 1e-9) / max(t5, 1e-9)) / math.log(2), 2)
    # join share of the full query at the largest point
    f10 = out["components"]["full"]["10"]
    s10 = out["components"]["scans"]["10"]
    out["join_share_x10"] = round(max(0.0, (f10 - s10)) / f10, 2)

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
