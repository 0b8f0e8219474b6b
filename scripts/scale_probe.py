"""Measured scaling curves: how does each headline query's runtime
grow when the FACT data grows x2 / x4 / x8 beyond sf0.1?

The bench answers "how fast at sf0.1"; the 100-TB question is "what's
the exponent". This probe derives scaled perf fixtures from the
driver's sf0.1 tables (perf only — correctness stays on the pristine
fixtures + oracles) and reports per-query med-of-3 runtimes and the
fitted exponent alpha = log(t_8/t_1) / log 8: alpha ~= 1 is linear
scale-out, alpha >> 1 is a blowup that 100x data would turn fatal.

Fixture derivation — NOT naive replication. Concatenating a table
with itself duplicates every key, which makes joins and near-dup
candidate generation quadratic in ways real 8x data would never be
(every order would have 8 clones of its lineitems; every document 7
identical twins). Instead, per replica i:

- orders/lineitem: o_orderkey/l_orderkey shifted by i*10^10 — the
  1:N order->lineitem structure is preserved exactly, so the
  fact-fact join output grows linearly, like real data;
- events: event_id and user_id shifted — key cardinality grows with
  volume (more users), keeping window-partition sizes realistic;
- documents: doc_id shifted and the text's letter classes rotated
  per replica (translate over two vowel/consonant sets) — replicas
  are fully decorrelated, so the near-dup families see a corpus
  with sf0.1's duplicate DENSITY at 8x the volume rather than a
  pathological 8-clone cluster per document;
- embeddings: vec_id shifted and each component deterministically
  jittered by replica — replicas land in different LSH buckets the
  way independent vectors would;
- dimensions (region/nation/customer/supplier/part) stay 1x:
  dims grow far slower than facts in every real deployment, and the
  broadcast-ability the plans rely on is exactly what this probe
  should validate.

Usage: python scripts/scale_probe.py [out_json]
Writes one JSON object {query: {"1": s, "2": s, "4": s, "8": s,
"alpha": a}} and prints a table. ~10-15 min on an idle local[32].
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_work_flow_for_big_data_spark.catalog import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [1, 2, 4, 8]
HEADLINE = [
    "agg_groupby",
    "agg_distinct",
    "join_star",
    "tpch_q3_shipping_priority",
    "tpch_q12_priority_by_tier",
    "window_ntile",
    "window_session",
    "parse_kv",
    "rate_charge",
    "text_quality",
    "dedup_exact",
    "dedup_minhash",
    "dedup_apply",
    "dedup_components",
    "llm_clean_corpus",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "ts_gapfill",
]
DIMS = ["region", "nation", "customer", "supplier", "part"]
_VOWS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio", "aeiou"[::-1], "eioua"[::-1], "iouae"[::-1]]


def _replica(spark, table, i):
    # load_table, not raw read: it normalizes the driver fixtures'
    # nanos/NTZ timestamp physical types (see catalog.py)
    df = load_table(spark, SRC, table)
    if i == 0:
        return df
    shift = i * 10_000_000_000
    if table == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + shift)
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + shift)
    if table == "events":
        return (df.withColumn("event_id", F.col("event_id") + shift)
                  .withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000)))
    if table == "documents":
        return (df.withColumn("doc_id", F.col("doc_id") + shift)
                  .withColumn("text", F.translate("text", _VOWS[0], _VOWS[i % len(_VOWS)])))
    if table == "embeddings":
        jitter = F.transform(
            "embedding",
            lambda x, j: (x + F.sin((F.col("vec_id") % 97 + j.cast("double")) * float(i)) * F.lit(0.15)).cast("float"),
        )
        return (df.withColumn("vec_id", F.col("vec_id") + shift)
                  .withColumn("embedding", jitter))
    return df


def build_fixture(spark, k, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for table in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        if table in DIMS or k == 1:
            df = load_table(spark, SRC, table)
        else:
            df = _replica(spark, table, 0)
            for i in range(1, k):
                df = df.unionByName(_replica(spark, table, i))
        df.write.mode("overwrite").parquet(dst)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe.json"

    from etl_work_flow_for_big_data_spark.queries import load_all
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    dirs = {}
    for k in FACTORS:
        d = f"/tmp/scale_probe_x{k}"
        build_fixture(spark, k, d)
        dirs[k] = d

    results = {}
    for name in HEADLINE:
        spec = registry[name]
        results[name] = {}
        for k in FACTORS:
            times = []
            for _ in range(3):
                t0 = time.time()
                # same action as bench.py: full materialization, no
                # driver-side row transfer
                spec.fn(spark, dirs[k]).write.mode("overwrite").format("noop").save()
                times.append(time.time() - t0)
            results[name][str(k)] = round(sorted(times)[1], 3)
        import math

        t1, t8 = results[name]["1"], results[name]["8"]
        alpha = math.log(max(t8, 1e-9) / max(t1, 1e-9)) / math.log(8)
        results[name]["alpha"] = round(alpha, 2)
        print(f"{name:28s} " + "  ".join(f"x{k}:{results[name][str(k)]:6.2f}s" for k in FACTORS)
              + f"  alpha={alpha:5.2f}", flush=True)

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"\nwritten {out_json}", flush=True)
    for k in FACTORS:
        shutil.rmtree(dirs[k], ignore_errors=True)


if __name__ == "__main__":
    main()
