"""IVF build-once/query-many (I3, VERDICT r10 next-round #3).

The one-shot `ivf_topk` recomputes the corpus-wide centroid assignment
per call; `ivf_build` persists the inverted file (postings partitioned
by cluster + centroids + build meta) and `ivf_query` serves query
batches against it. The load-bearing contracts pinned here:

1. build + query ≡ the one-shot operator (same deterministic
   assignment/ranking conventions) for in-corpus queries, at nprobe 1
   and 2;
2. the postings read is STATIC partition pruning — a query batch's
   scan touches ONLY the probed cluster directories (the on-disk
   inverted-file property that makes per-batch cost O(probed lists),
   not O(corpus));
3. out-of-corpus query vectors work (nearest-centroid assignment) —
   the case the one-shot form cannot express.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.operators.similarity import (
    ivf_build,
    ivf_query,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from etl_work_flow_for_big_data_spark.catalog import load_table
    from etl_work_flow_for_big_data_spark.functions.vectors import (
        is_valid_embedding,
    )

    return load_table(spark, sf_dir, "embeddings").filter(
        is_valid_embedding(F.col("embedding"), dim=64)
    )


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_build(emb, "vec_id", "embedding", p, n_centroids=16)
    return p


QUERY_IDS = [16, 17, 18, 19, 20]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("nprobe", [1, 2])
def test_build_query_matches_one_shot(spark, emb, index_path, nprobe):
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    got = _rows(
        ivf_query(spark, index_path, queries, "vec_id", "embedding",
                  k=5, nprobe=nprobe)
    )
    want = _rows(
        ivf_topk(emb, QUERY_IDS, "vec_id", "embedding",
                 n_centroids=16, k=5, nprobe=nprobe)
    )
    assert got == want and len(got) > 0


def test_postings_scan_prunes_to_probed_clusters(spark, index_path):
    postings = spark.read.parquet(f"{index_path}/postings")
    clusters = sorted(
        r["cluster"] for r in postings.select("cluster").distinct().collect()
    )
    assert len(clusters) > 2  # pruning needs something to prune
    probe = clusters[:2]
    pruned = postings.filter(F.col("cluster").isin(probe))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the isin lands in PartitionFilters (directory pruning), not a
    # post-scan Filter over the data columns
    pf = next(
        (ln for ln in plan.splitlines() if "PartitionFilters" in ln), ""
    )
    assert "cluster" in pf and "IN" in pf.upper(), plan
    # and the pruned read returns exactly the probed lists' rows
    assert 0 < pruned.count() < postings.count()


def test_out_of_corpus_query_assigns_to_nearest_centroid(spark, emb, index_path):
    cent = spark.read.parquet(f"{index_path}/centroids").collect()
    # a synthetic query vector = centroid 3's direction, fresh id
    v = [float(x) for x in cent[3]["cvec"]]
    cid = cent[3]["cid"]
    q = spark.createDataFrame(
        [(10_000_000, v)], "vec_id long, embedding array<float>"
    )
    out = ivf_query(spark, index_path, q, "vec_id", "embedding", k=3).collect()
    assert len(out) > 0
    # its neighbors all come from the nearest centroid's posting list
    members = {
        r["vec_id"]
        for r in spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("cluster") == cid)
        .collect()
    }
    assert {r["c_vec_id"] for r in out} <= members


def test_index_layout_and_meta(spark, index_path):
    assert os.path.isdir(f"{index_path}/postings")
    meta = spark.read.parquet(f"{index_path}/meta").collect()[0]
    assert (meta["n_centroids"], meta["kmeans_iters"], meta["mode"]) == (
        16, 0, "all",
    )
    assert meta["id_col"] == "vec_id" and meta["vec_col"] == "embedding"
    assert spark.read.parquet(f"{index_path}/centroids").count() == 16


def test_refined_build_recovers_cross_boundary_neighbor(spark, tmp_path):
    """iters>0 composes: the nprobe=2 boundary recovery holds through
    build+query (exact parity with the one-shot is pinned only at
    iters=0 — refined means are FP-order-dependent across runs)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.9, 0.40, 0.0, 0.0]),
        (20, [0.72, 0.73, 0.0, 0.0]),
        (30, [1.0, 0.05, 0.2, 0.0]),
        (31, [0.95, 0.0, 0.0, 0.2]),
        (40, [0.0, 1.0, 0.2, 0.0]),
        (41, [0.05, 0.95, 0.0, 0.2]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = str(tmp_path / "index")
    ivf_build(corpus, "vec_id", "embedding", p, n_centroids=2, kmeans_iters=2)
    out = ivf_query(
        spark, p, corpus.filter("vec_id = 10"), "vec_id", "embedding",
        k=1, nprobe=2,
    ).collect()
    assert [(r["q_vec_id"], r["rank"], r["c_vec_id"]) for r in out] == [
        (10, 1, 20)
    ]


def test_empty_corpus_builds_and_queries_empty(spark, tmp_path):
    """Fuzz seed 80096 (tiny axis): a corpus where every row falls
    outside the validity domain builds an index with NO data files —
    partitionBy writes nothing — and the query side must return an
    empty frame (declared-schema read), not die in schema inference.
    Matches the one-shot operator, which is empty-in/empty-out."""
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    p = str(tmp_path / "index")
    ivf_build(empty, "vec_id", "embedding", p, n_centroids=16)
    q = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    out = ivf_query(spark, p, q, "vec_id", "embedding", k=5)
    assert out.columns == ["q_vec_id", "rank", "c_vec_id", "cos_sim"]
    assert out.count() == 0
    # empty QUERY batch against a real index is also empty-out
    out2 = ivf_query(spark, p, empty, "vec_id", "embedding", k=5)
    assert out2.count() == 0


def test_quantized_index_composes(spark, emb, tmp_path):
    """The 100-TB composition: int8-quantize at write, build the
    inverted file over the quantized column, serve batches from it —
    postings carry 4x fewer bytes and build+query still ≡ the one-shot
    operator on the same quantized frame (vec_col generality)."""
    from etl_work_flow_for_big_data_spark.functions.vectors import (
        quantize_embedding,
    )

    qz = emb.select(
        "vec_id", quantize_embedding(F.col("embedding"))["q"].alias("q")
    )
    p = str(tmp_path / "index")
    ivf_build(qz, "vec_id", "q", p, n_centroids=16)
    got = _rows(
        ivf_query(
            spark, p, qz.filter(F.col("vec_id").isin(QUERY_IDS)),
            "vec_id", "q", k=5,
        )
    )
    want = _rows(
        ivf_topk(qz, QUERY_IDS, "vec_id", "q", n_centroids=16, k=5)
    )
    assert got == want and len(got) > 0


def test_nprobe_validates(spark, emb, index_path):
    with pytest.raises(ValueError, match="nprobe"):
        ivf_query(spark, index_path, emb.limit(1), "vec_id", "embedding",
                  nprobe=0)


def test_out_of_corpus_low_id_assigns_by_vector(spark, tmp_path):
    """r11 ADVICE (medium): the iters=0 centroid-owns-itself override
    must key on MEMBERSHIP in the persisted centroid id set, not
    `id < n_centroids` — an out-of-corpus query whose fresh id merely
    falls below n_centroids assigns by its VECTOR. Sparse corpus: ids
    {0,1,50..53} under n_centroids=4 make the centroid set {0,1};
    query id 3 (< 4, NOT a centroid) must reach cluster 1's posting
    list, not be forced to the nonexistent cluster 3 (which silently
    returned 0 rows before the fix)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (50, [0.95, 0.1, 0.0, 0.0]),
        (51, [0.9, 0.2, 0.0, 0.0]),
        (52, [0.1, 0.95, 0.0, 0.0]),
        (53, [0.2, 0.9, 0.0, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = str(tmp_path / "index")
    ivf_build(corpus, "vec_id", "embedding", p, n_centroids=4)
    q = spark.createDataFrame(
        [(3, [0.05, 1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = ivf_query(spark, p, q, "vec_id", "embedding", k=3).collect()
    assert {r["c_vec_id"] for r in out} == {1, 52, 53}


def test_persisted_query_cache_invalidates_on_table_rewrite(spark, tmp_path):
    """r11 ADVICE: the registered sim_ivf_persisted query caches the
    built index per table FINGERPRINT (mtime+size walk), not per
    sf_dir — regenerating the embeddings table at the same path must
    rebuild and serve the NEW corpus, not the stale index."""
    import random

    from etl_work_flow_for_big_data_spark.queries.similarity import (
        _embeddings_fingerprint,
        sim_ivf_persisted,
    )

    sf_dir = str(tmp_path)

    def write_table(seed: int) -> None:
        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
        ]
        (
            spark.createDataFrame(rows, "vec_id long, embedding array<float>")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{sf_dir}/embeddings.parquet")
        )

    write_table(1)
    fp1 = _embeddings_fingerprint(sf_dir)
    first = _rows(sim_ivf_persisted(spark, sf_dir))
    write_table(2)
    fp2 = _embeddings_fingerprint(sf_dir)
    assert fp1 != fp2
    got = _rows(sim_ivf_persisted(spark, sf_dir))
    # the rebuilt index serves the NEW corpus: identical to the
    # one-shot operator over the rewritten table (the stale index
    # would replay seed-1 neighbors/cosines)
    from etl_work_flow_for_big_data_spark.catalog import load_table

    want = _rows(
        ivf_topk(
            load_table(spark, sf_dir, "embeddings"),
            QUERY_IDS, "vec_id", "embedding", n_centroids=16, k=5,
        )
    )
    assert got == want and got != first


def test_persisted_query_cache_evicts_superseded_index(spark, tmp_path):
    """r12 ADVICE: a fingerprint change must DROP the superseded cache
    entry and remove its temp index directory — keyed-by-fingerprint
    alone, every fixture rewrite leaked an index dir and a cache entry
    for the life of the session."""
    import os
    import random

    from etl_work_flow_for_big_data_spark.queries import similarity as qs

    sf_dir = str(tmp_path)

    def write_table(seed: int) -> None:
        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)
        ]
        (
            spark.createDataFrame(rows, "vec_id long, embedding array<float>")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{sf_dir}/embeddings.parquet")
        )

    write_table(1)
    _rows(qs.sim_ivf_persisted(spark, sf_dir))
    slot = ("persisted", sf_dir)
    _fp1, path1 = qs._IVF_INDEX_CACHE[slot]
    assert os.path.isdir(os.path.dirname(path1))
    n_before = len(qs._IVF_INDEX_CACHE)

    write_table(2)
    _rows(qs.sim_ivf_persisted(spark, sf_dir))
    _fp2, path2 = qs._IVF_INDEX_CACHE[slot]
    assert path2 != path1
    # at most one live index per slot: entry count unchanged, old dir gone
    assert len(qs._IVF_INDEX_CACHE) == n_before
    assert not os.path.exists(os.path.dirname(path1))
    assert os.path.isdir(os.path.dirname(path2))
