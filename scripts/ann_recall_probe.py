"""ANN recall-vs-cost curves at x16 volume — the tuning surface a
100-TB user actually needs (VERDICT r9 stretch #7).

The correctness suite pins recall at FIXED params (planted-neighbor
tests, tests/test_similarity_ops.py); this probe sweeps the knobs on
a 32k-vector corpus (the x16 perf fixture derivation: decorrelated
replicas, scripts/scale_probe.py) and records, per configuration,

- recall@10 against the exact brute-force top-10 (topk_cosine — the
  verified baseline; ground truth, not another approximation),
- candidate pairs scored (the real cost driver at scale: ANN cost is
  the candidate-join's output size, wall time at 32k is mostly fixed
  overhead),
- wall seconds (context only).

Swept: ann_lsh_topk n_planes x {4,8,12,16} x multi_probe {off,on};
ivf_topk n_centroids x {16,64,256} at kmeans_iters=2 (the refined
form library callers use; the oracled query keeps iters=0 for
cross-engine determinism only); and (r12) the PERSISTED build/serve
path ivf_build+ivf_query sweeping kmeans_iters x {0,2,4} at fixed
n_centroids/nprobe — the recall-vs-iters evidence behind
sim_ivf_trained (training moves recall at fixed probe cost; the
oracled query itself serves at probe-ALL where the answer is exact).

Usage: python scripts/ann_recall_probe.py [out_json] [factor]
Default factor 16. Results + per-knob guidance land in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

K = 10
N_QUERIES = 48


def recall_at_k(exact: dict[int, set], approx_rows) -> float:
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r.q_vec_id, set()).add(r.c_vec_id)
    return round(
        sum(len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact)
        / len(exact),
        3,
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_recall.json"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    os.environ.setdefault("SPARK_GRAFT_PROBE_TABLES", "embeddings")
    from scale_probe import build_fixture  # noqa: E402

    from etl_work_flow_for_big_data_spark.functions.vectors import (
        is_valid_embedding,
    )
    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ann_lsh_topk,
        ivf_topk,
        topk_cosine,
    )
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("ann-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fix_dir = f"/tmp/spark_graft_scale_x{factor}"
    build_fixture(spark, factor, fix_dir)

    corpus = (
        spark.read.parquet(os.path.join(fix_dir, "embeddings.parquet"))
        .filter(is_valid_embedding(F.col("embedding"), dim=64))
        .select("vec_id", "embedding")
        .cache()
    )
    n = corpus.count()
    # spread queries across replicas (ids shift by 10^10 per replica)
    # replica ids are shifted by i*10^10, so reduce BEFORE multiplying
    # (vec_id * constant would overflow ANSI long on the shifted ids)
    spread = ((F.col("vec_id") % 100_003) * 2654435761) % 9973
    qids = [r.vec_id for r in corpus.orderBy(spread, "vec_id")
            .limit(N_QUERIES).collect()]
    queries = corpus.filter(F.col("vec_id").isin(qids))

    exact_rows = topk_cosine(queries, corpus, "vec_id", "embedding", k=K).collect()
    exact: dict[int, set] = {}
    for r in exact_rows:
        if r.q_vec_id != r.c_vec_id:
            exact.setdefault(r.q_vec_id, set()).add(r.c_vec_id)

    record: dict = {"corpus_vectors": n, "n_queries": len(exact), "k": K,
                    "lsh": [], "ivf": []}

    for n_planes in (4, 8, 12, 16):
        for probe in (False, True):
            t0 = time.perf_counter()
            res = ann_lsh_topk(queries, corpus, "vec_id", "embedding",
                               k=K, n_planes=n_planes, multi_probe=probe)
            rows = res.collect()
            wall = time.perf_counter() - t0
            # candidate pairs actually scored: re-derive the candidate
            # join's size (same deterministic plan, count-only)
            from etl_work_flow_for_big_data_spark.functions.vectors import (
                lsh_hyperplane_sig,
            )
            sig = lsh_hyperplane_sig("embedding", n_planes, 64)
            qs = queries.select(F.col("vec_id").alias("q"), sig.alias("s"))
            if probe:
                qs = qs.select("q", F.explode(F.array(
                    F.col("s"), *[F.col("s").bitwiseXOR(F.lit(1 << p))
                                  for p in range(n_planes)])).alias("s")).distinct()
            cs = corpus.select(F.col("vec_id").alias("c"), sig.alias("s"))
            n_cand = (cs.join(qs, "s").filter(F.col("q") != F.col("c"))
                      .select("q", "c").distinct().count())
            entry = {"n_planes": n_planes, "multi_probe": probe,
                     "recall": recall_at_k(exact, rows),
                     "cand_pairs": n_cand, "wall_sec": round(wall, 2)}
            record["lsh"].append(entry)
            print(entry, file=sys.stderr)

    for n_centroids in (16, 64, 256):
        for nprobe in (1, 2, 4):
            t0 = time.perf_counter()
            res = ivf_topk(corpus, qids, "vec_id", "embedding",
                           n_centroids=n_centroids, k=K, kmeans_iters=2,
                           nprobe=nprobe)
            rows = res.collect()
            wall = time.perf_counter() - t0
            # IVF candidate cost ~ nprobe/n_centroids of the corpus
            # per query, in expectation
            entry = {"n_centroids": n_centroids, "nprobe": nprobe,
                     "recall": recall_at_k(exact, rows),
                     "cand_pairs_expected": round(
                         n * len(exact) * nprobe / n_centroids),
                     "wall_sec": round(wall, 2)}
            record["ivf"].append(entry)
            print(entry, file=sys.stderr)

    import tempfile

    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ivf_build,
        ivf_query,
    )

    record["ivf_iters"] = []
    for iters in (0, 2, 4):
        p = tempfile.mkdtemp(prefix=f"recall_iters{iters}_") + "/index"
        t0 = time.perf_counter()
        ivf_build(corpus, "vec_id", "embedding", p,
                  n_centroids=64, kmeans_iters=iters)
        build = time.perf_counter() - t0
        for nprobe in (1, 2):
            t0 = time.perf_counter()
            rows = ivf_query(spark, p, queries, "vec_id", "embedding",
                             k=K, nprobe=nprobe).collect()
            wall = time.perf_counter() - t0
            entry = {"kmeans_iters": iters, "n_centroids": 64,
                     "nprobe": nprobe,
                     "recall": recall_at_k(exact, rows),
                     "build_sec": round(build, 2),
                     "query_sec": round(wall, 2)}
            record["ivf_iters"].append(entry)
            print(entry, file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
