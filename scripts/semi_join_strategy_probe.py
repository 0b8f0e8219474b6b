"""subquery_exists semi-join strategy probe at x10 (VERDICT r12 #6).

The decorrelated EXISTS (orders left-semi lineitem on orderkey +
shipdate>orderdate) runs sort-merge in the big regime (the r13 size
gate pins merge once lineitem's footer count prices past the broadcast
budget). alpha_tail read 0.48 in r12's slopes; the verdict asked for a
measured merge-vs-shuffled-hash comparison at ~sf1 before accepting
merge as the big-regime strategy.

Why shuffled-hash is plausible here: the semi-join probes orders
(smaller fact) against lineitem (larger); SHJ builds a hash table per
partition from the BUILD side and skips both sort passes. Spark only
auto-picks SHJ when one side is much smaller per partition and
spark.sql.join.preferSortMergeJoin=false; a hint forces it. Risk at
100 TB: the per-partition build must fit in memory — SHJ can OOM an
executor where SMJ spills, so SHJ is only safe when the build side is
bounded (here: orders rows / shuffle partitions, with AQE re-splitting
skew).

Method: one session, warm pass, then N interleaved rounds of
[merge-form, shj-form], lower-median per form. Writes JSON to stdout;
the round ledger (SCALE.md) records the decision.

Usage: python scripts/semi_join_strategy_probe.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from etl_work_flow_for_big_data_spark.catalog import load_table
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("semi-join-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def build(strategy: str):
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").hint(strategy)
        return (
            o.join(
                li,
                (o.o_orderkey == li.l_orderkey)
                & (li.l_shipdate > o.o_orderdate),
                "left_semi",
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    def run(strategy: str) -> float:
        t0 = time.perf_counter()
        build(strategy).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    forms = ["merge", "shuffle_hash"]
    for s in forms:  # warm pass, untimed
        run(s)
    samples = {s: [] for s in forms}
    for _ in range(rounds):
        for s in forms:
            samples[s].append(run(s))
    med = {s: sorted(v)[(len(v) - 1) // 2] for s, v in samples.items()}

    # sanity: the hint actually took (plan shape per strategy)
    plans = {
        s: build(s)._jdf.queryExecution().executedPlan().toString()
        for s in forms
    }
    rec = {
        "metric": "semi_join_strategy",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "merge_med_sec": round(med["merge"], 3),
        "shuffle_hash_med_sec": round(med["shuffle_hash"], 3),
        "samples": {s: [round(x, 3) for x in v] for s, v in samples.items()},
        "merge_plan_has_smj": "SortMergeJoin" in plans["merge"],
        "shj_plan_has_shj": "ShuffledHashJoin" in plans["shuffle_hash"],
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
