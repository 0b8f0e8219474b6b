"""Similarity-search operators over embedding columns
(SURVEY.md §2.I I3): brute-force top-k (exact baseline), pairwise
near-dup, and LSH-bucketed ANN (the scale path).

Scale design:

- **topk_cosine**: broadcast the (small) query set against the full
  candidate table — a BroadcastNestedLoopJoin where the streamed side
  is the big table, scanned once, no shuffle of candidates. Linear in
  candidates × queries; right whenever |queries| is dim-table-sized.
- **cosine_pairs**: O(n²) all-pairs — the exact baseline. Driver
  memory is bounded via corpus blocking (collect one hash block at a
  time, stream the table against each); switch to LSH when the n²
  compute itself is the problem.
- **ann_lsh_topk**: hyperplane-LSH bucket equi-join; each query only
  scores candidates in its bucket. Shuffle O(n), score O(n²/2^planes)
  in expectation. Recall tunable via n_planes / multi-probe.

Ranking uses ROUND(cos, 6) + id tie-break so order is deterministic
and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.functions.vectors import (
    cosine,
    lsh_hyperplane_sig,
)


def topk_cosine(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query set (dim-table-sized by contract) is collected into a
    numpy matrix shipped with the kernel; candidates stream through
    mapInPandas in Arrow batches — the big side is scanned once, never
    shuffled, and the per-batch compute is vectorized (bit-identical
    to the expression fold; see functions/kernels.py).
    Returns (q_vec_id, rank, c_vec_id, cos_sim)."""
    from etl_work_flow_for_big_data_spark.functions.kernels import pairwise_cosine

    corpus = [
        (r[0], list(r[1]))
        for r in queries.select(id_col, vec_col).collect()
    ]
    scored = pairwise_cosine(candidates, id_col, vec_col, corpus, mode="all")
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), "c_vec_id")
    return (
        scored.select(
            F.col("d2").alias("q_vec_id"),
            F.col("d1").alias("c_vec_id"),
            F.round("cos_raw", 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "rank", "c_vec_id", "cos_sim")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_size: int = 65536,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact O(n²) baseline).

    Driver memory is bounded at ``block_size`` vectors REGARDLESS of
    corpus size: the corpus is split into hash blocks
    (``pmod(id, n_blocks)``); each block in turn is collected as the
    kernel's broadcast matrix (~block_size × dim × 8 B, ≈32 MiB at the
    default for 64-dim), the full table streams through the Arrow
    kernel against it, and the block's scored rows are eagerly
    ``localCheckpoint``-ed — truncating lineage so the block matrix in
    the kernel closure is released before the next block is collected.
    An unordered pair {x, y}, x < y, is produced exactly once: in the
    block that owns y (the kernel keeps stream_id < corpus_id).

    Compute stays O(n²·dim) split over n/block_size passes — that is
    the exact-baseline contract; ann_lsh_topk / minhash candidates are
    the scale path when n² itself is the problem. A conservative
    raw-cosine prefilter inside the kernel keeps the Arrow transfer at
    result size instead of n² size; the exact rounded filter is
    applied Spark-side."""
    from etl_work_flow_for_big_data_spark.functions.kernels import pairwise_cosine

    n = df.count()
    n_blocks = max(1, -(-n // block_size))
    parts = []
    for b in range(n_blocks):
        blk = (
            df
            if n_blocks == 1
            else df.filter(F.pmod(F.col(id_col), F.lit(n_blocks)) == b)
        )
        corpus = [(r[0], list(r[1])) for r in blk.select(id_col, vec_col).collect()]
        scored = pairwise_cosine(
            df, id_col, vec_col, corpus, mode="pairs", prefilter=threshold - 1e-6
        )
        if n_blocks > 1:
            # eager materialization per block: the next collect() only
            # happens after this block's matrix is out of the plan
            scored = scored.localCheckpoint(eager=True)
        parts.append(scored)
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionAll(p)
    return (
        scored.withColumn("cos_sim", F.round("cos_raw", 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("d1", "d2", "cos_sim")
    )


def ann_lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH
    bucket. Returns (q_vec_id, rank, c_vec_id, cos_sim) — recall < 1
    by design; deterministic given the md5 hash family."""
    sig = lsh_hyperplane_sig(vec_col, n_planes, dim)
    q = queries.select(
        F.col(id_col).alias("q_vec_id"),
        F.col(vec_col).alias("q_vec"),
        sig.alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("c_vec_id"),
        F.col(vec_col).alias("c_vec"),
        sig.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("q_vec_id") != F.col("c_vec_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), "c_vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "rank", "c_vec_id", "cos_sim")
    )


def ivf_topk(
    df: DataFrame,
    query_ids,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (deterministic centroid set: the first ``n_centroids`` ids — a
    k-means iteration would refine them; assignment logic is
    identical), then answer each query from its own cluster only.

    Scale shape: centroid assignment is one kernel pass (O(n·c));
    search is an equi-join on cluster id, scoring O(n·q/c) in
    expectation — the inverted-file trade. Deterministic end-to-end:
    ties in assignment break on centroid id, ranking on rounded cosine
    + candidate id.
    Returns (q_vec_id, rank, c_vec_id, cos_sim).
    """
    from etl_work_flow_for_big_data_spark.functions.kernels import pairwise_cosine

    centroids = [
        (r[0], list(r[1]))
        for r in df.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    ]
    scored = pairwise_cosine(df, id_col, vec_col, centroids, mode="all")
    w_assign = Window.partitionBy("d1").orderBy(
        F.desc(F.round("cos_raw", 6)), F.asc("d2")
    )
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(F.col("d1").alias(id_col), F.col("d2").alias("cluster"))
    )
    # centroids themselves: nearest non-self centroid wins above, but a
    # centroid belongs to its own cluster by definition
    assigned = assigned.withColumn(
        "cluster",
        F.when(F.col(id_col) < n_centroids, F.col(id_col)).otherwise(
            F.col("cluster")
        ),
    )
    vecs = df.select(F.col(id_col), F.col(vec_col)).join(assigned, id_col)
    q = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_vec_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("cluster"),
        )
    )
    c = vecs.select(
        F.col(id_col).alias("c_vec_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("cluster"),
    )
    from etl_work_flow_for_big_data_spark.functions.vectors import cosine

    pairs = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("q_vec_id") != F.col("c_vec_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos_sim"), "c_vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "rank", "c_vec_id", "cos_sim")
    )
