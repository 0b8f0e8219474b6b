"""End-to-end demo: LLM training-data preparation on this engine.

The other half of the engine next to the reference's mediation/rating
workflow (examples/mediation_rating_demo.py): take a raw document
corpus with embeddings, score text quality, deduplicate exactly and
by near-duplicate similarity, refine an IVF index with k-means and run
similarity search, extract multimodal features over Arrow batches —
the operations a 100 TB training-data pipeline runs daily, here at
fixture scale.

Run: ``python examples/llm_corpus_prep_demo.py`` (local[*], ~60 s).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.catalog import load_table
from etl_work_flow_for_big_data_spark.functions.text import token_count
from etl_work_flow_for_big_data_spark.multimodal.columns import (
    attach_binary,
    extract_features,
)
from etl_work_flow_for_big_data_spark.operators.dedup import (
    apply_near_dedup,
    dedup_exact,
    minhash_lsh_pairs,
)
from etl_work_flow_for_big_data_spark.operators.similarity import (
    ann_near_dup_pairs,
    ivf_topk,
    kmeans_inertia,
    kmeans_refine,
    topk_cosine,
)
from etl_work_flow_for_big_data_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("llm-corpus-prep-demo")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 1. quality gate — narrow per-row expressions, no shuffle
    qual = docs.withColumn(
        "n_tokens", token_count(F.col("text")).cast("int")
    ).filter(F.col("n_tokens") >= 20)
    print(f"after quality gate (>=20 tokens): {qual.count()}")

    # 2. exact dedup — digest groupBy; only 16-byte hashes shuffle
    keepers = dedup_exact(qual, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    uniq = qual.join(keepers, "doc_id", "left_semi")
    print(f"after exact dedup: {uniq.count()}")

    # 3. near-dup removal — MinHash-LSH band candidates + exact-Jaccard
    #    verify (sub-quadratic; the 100 TB path)
    pairs = minhash_lsh_pairs(uniq, "text", "doc_id", k=5, threshold=0.5)
    clean = apply_near_dedup(uniq, pairs, "doc_id")
    print(f"after near-dup removal: {clean.count()}")

    # 3b. SEMANTIC near-dup removal over the embeddings (r13): LSH
    #     bucket candidates -> exact cosine verify -> keep-lowest-id;
    #     n_tables / multi_probe are the measured recall levers
    sem_pairs = ann_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_tables=2
    )
    semantic = apply_near_dedup(clean, sem_pairs, "doc_id")
    print(f"after semantic (embedding) near-dup removal: {semantic.count()}")

    # 4. similarity search over embeddings — exact baseline, then IVF
    #    with k-means-refined centroids
    queries = emb.filter(F.col("vec_id") < 3)
    exact = topk_cosine(queries, emb, "vec_id", "embedding", k=5)
    print("exact top-5 neighbors of query 0:")
    exact.filter(F.col("q_vec_id") == 0).show()

    init = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 16).collect()
    ]
    refined = kmeans_refine(emb, "vec_id", "embedding", init, iters=2)
    print(
        "k-means objective: "
        f"init={kmeans_inertia(emb, 'vec_id', 'embedding', init):.4f} "
        f"refined={kmeans_inertia(emb, 'vec_id', 'embedding', refined):.4f}"
    )
    ivf = ivf_topk(
        emb, [16, 17], "vec_id", "embedding", n_centroids=16, k=5, kmeans_iters=2
    )
    print("IVF (k-means refined) top-5 for queries 16/17:")
    ivf.show()

    # 5. multimodal features — Arrow-batched mapInPandas over binary
    media = attach_binary(semantic.limit(100), "text")
    feats = extract_features(media, "doc_id")
    print("feature extraction sample:")
    feats.show(3, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
