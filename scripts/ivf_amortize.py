"""IVF build-once/query-many amortization measurement (r11).

The claim behind `ivf_build`/`ivf_query` (VERDICT r10 next-round #3):
the one-shot `ivf_topk` pays a corpus-wide centroid-assignment kernel
pass on EVERY call, while a persisted index pays it once — after which
each query batch costs one constant-size centroid read + a scan of
only the probed cluster directories. This script measures both forms
serving B query batches on the sf0.1 embeddings table and prints the
per-batch cost curve; the reading lives in SCALE.md.

At sf0.1 the embeddings table is only 2,000 rows, so the corpus-wide
pass the persisted form skips is trivially cheap and fixed overheads
(driver collects, job scheduling) dominate both forms — the x1 cell
exists as that honest baseline. The ``volumes`` axis self-unions the
corpus (id-offset copies) so the measurement shows the TREND the
operator exists for: one-shot per-batch cost grows with corpus size
(kernel pass + assignment shuffle every call), persisted per-batch
cost grows only with the probed lists.

Usage: python scripts/ivf_amortize.py [n_batches] [sf_dir] [volumes_csv]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[(len(xs) - 1) // 2]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    volumes = (
        [int(x) for x in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [1, 16]
    )
    from etl_work_flow_for_big_data_spark.catalog import load_table
    from etl_work_flow_for_big_data_spark.functions.vectors import (
        is_valid_embedding,
    )
    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ivf_build,
        ivf_query,
        ivf_topk,
    )
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("ivf-amortize")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(is_valid_embedding(F.col("embedding"), dim=64))
        .select("vec_id", "embedding")
    )
    # B disjoint 5-query batches, same shape as the oracled queries
    batches = [list(range(16 + 5 * b, 21 + 5 * b)) for b in range(n_batches)]

    # warm the python worker pool (same rationale as bench.py)
    def _ident(it):
        yield from it

    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        _ident, "id long"
    ).write.mode("overwrite").format("noop").save()

    def _noop(df):
        df.write.mode("overwrite").format("noop").save()

    rec = {"metric": "ivf_amortization", "sf_dir": sf_dir,
           "n_batches": n_batches, "cells": {}}
    for mult in volumes:
        # id-offset replication via explode (one plan node, not mult-1
        # unions): copy 0 keeps the real ids (centroids = first 16 ids
        # stay in copy 0; query ids likewise), extra copies only grow
        # the corpus the one-shot assignment pass must cover per call
        e = base
        if mult > 1:
            e = (
                base.select(
                    "vec_id", "embedding",
                    F.explode(
                        F.sequence(F.lit(0), F.lit(mult - 1))
                    ).alias("__copy"),
                )
                .select(
                    (
                        F.col("vec_id")
                        + F.col("__copy").cast("long") * 10_000_000
                    ).alias("vec_id"),
                    "embedding",
                )
                .repartition(32)
                .localCheckpoint()  # pay replication cost once
            )
        n = e.count()

        one_shot = []
        for ids in batches:
            # r14: ivf_topk persists its assignment, and Spark's
            # CacheManager matches the IDENTICAL assignment subtree
            # across calls (query ids don't feed it) — so consecutive
            # in-session "one-shot" calls would silently amortize and
            # this cell would no longer measure one-shot semantics.
            # Clearing the cache restores the contract: each batch
            # pays the full corpus assignment pass, as a fresh
            # process/session would. (The checkpointed `e` replica is
            # an RDD checkpoint, not a cache entry — unaffected.)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _noop(ivf_topk(e, ids, "vec_id", "embedding",
                           n_centroids=16, k=5))
            one_shot.append(time.perf_counter() - t0)

        index_path = tempfile.mkdtemp(prefix="ivf_amortize_") + "/index"
        t0 = time.perf_counter()
        ivf_build(e, "vec_id", "embedding", index_path, n_centroids=16)
        build_sec = time.perf_counter() - t0
        queries = []
        for ids in batches:
            q = base.filter(F.col("vec_id").isin(ids))
            t0 = time.perf_counter()
            _noop(ivf_query(spark, index_path, q, "vec_id", "embedding",
                            k=5))
            queries.append(time.perf_counter() - t0)
        # nprobe=2: the recall lever's serve cost (scan grows ~2 probed
        # lists per query; build is shared) — VERDICT r11 #6 asks the
        # committed record to carry both probe points
        queries_np2 = []
        for ids in batches:
            q = base.filter(F.col("vec_id").isin(ids))
            t0 = time.perf_counter()
            _noop(ivf_query(spark, index_path, q, "vec_id", "embedding",
                            k=5, nprobe=2))
            queries_np2.append(time.perf_counter() - t0)

        med_os, med_q = _median(one_shot), _median(queries)
        rec["cells"][f"x{mult}"] = {
            "corpus_rows": n,
            "one_shot_per_batch_sec": [round(x, 3) for x in one_shot],
            "one_shot_med_sec": round(med_os, 3),
            "build_sec": round(build_sec, 3),
            "query_per_batch_sec": [round(x, 3) for x in queries],
            "query_med_sec": round(med_q, 3),
            "query_med_sec_nprobe2": round(_median(queries_np2), 3),
            "speedup_per_batch": round(med_os / med_q, 2),
            "breakeven_batches": round(
                build_sec / max(med_os - med_q, 1e-9), 1
            ),
        }
        print(f"x{mult}: {rec['cells'][f'x{mult}']}", file=sys.stderr)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
