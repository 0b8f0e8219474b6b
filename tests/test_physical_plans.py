"""Physical-plan property tests — the 100-TB guardrails.

These pin the plan shapes that matter at scale: filters reaching the
parquet scan (PushedFilters), column pruning (ReadSchema), dim joins
staying broadcast, global top-k planning as TakeOrderedAndProject
(per-partition heaps, no full sort), and whole-stage codegen covering
the hot expressions. A regression here can pass every correctness test
and still be 100× slower on a cluster.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.queries import load_all

REGISTRY = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_rate_charge_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rate_charge")
    # shipdate filter reaches the scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # unused columns pruned from the read (11-col table, 7 used)
    assert "l_partkey" not in plan and "l_suppkey" not in plan


def test_join_broadcast_stays_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_join_star_only_fact_join_shuffles(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_star")
    # dims (customer/nation/region) broadcast; at most the
    # lineitem⋈orders fact join may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1
    # orderdate filter pushed into the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk")
    assert "TakeOrderedAndProject" in plan


def test_sample_quota_plans_window_group_limit(spark, sf_dir):
    # the rank<=N filter must reach the map side: Partial
    # WindowGroupLimit keeps each task's local top-N per key BEFORE
    # the shuffle, so a hot domain ships N rows per input partition
    # instead of its whole row set
    plan = _plan(spark, sf_dir, "sample_quota")
    # pin Partial on the WindowGroupLimit line itself (a bare
    # 'Partial' substring also matches unrelated partial aggregates,
    # so it would keep passing if the limit regressed to Final-only)
    assert re.search(r"WindowGroupLimit .*row_number\(\), \d+, Partial", plan)


def test_join_anti_semi_physical(spark, sf_dir):
    anti = _plan(spark, sf_dir, "join_anti")
    semi = _plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_join_range_stays_codegen(spark, sf_dir):
    """Disjoint tier join compiles to CASE bucketing + broadcast
    equi-join — no BroadcastNestedLoopJoin in the plan."""
    plan = _plan(spark, sf_dir, "join_range")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_mm_meta_prunes_binary_payload(spark, sf_dir):
    """Metadata projection must not force the text/content bytes into
    the scan beyond what the query needs."""
    plan = _plan(spark, sf_dir, "text_tokens")
    # documents has 5 columns; tokens query needs text+lang only
    assert "doc_id" not in plan.split("ReadSchema")[-1]


def test_parse_kv_single_stage(spark, sf_dir):
    """Packet parsing is narrow: zero Exchanges — parsing never
    shuffles, and queries return unordered results by contract (a
    presentation sort would range-sample the child and execute the
    whole parse twice)."""
    plan = _plan(spark, sf_dir, "parse_kv")
    assert plan.count("Exchange") == 0


def test_rate_charge_codegen(spark, sf_dir):
    """The rating expressions sit inside whole-stage codegen. AQE only
    reveals codegen spans in the FINAL plan, so execute first."""
    df = REGISTRY["rate_charge"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert re.search(r"\*\(\d+\)", plan)


def test_dedup_minhash_small_regime_keeps_broadcast(spark, sf_dir):
    """Size gate, SMALL regime (r13, VERDICT r12 #3): the registered
    query passes the parquet-footer doc count, and at fixture scale
    (500-5000 docs × 4 KiB conservative shingle-row price) the gate
    clears — the merge pins are OMITTED and Catalyst keeps the r11
    broadcast plan it picks for a dim-sized corpus. r12's
    unconditional pin paid sort-merge exchanges here for nothing
    (dedup_minhash 1.00 → 1.46 s at sf0.1)."""
    df = REGISTRY["dedup_minhash"].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dedup_minhash_big_regime_never_broadcasts_corpus(spark, sf_dir):
    """Size gate, BIG/UNKNOWN regime (the r12 ~sf1 OOM fix must
    survive the r13 gate): every side of the band self-join and the
    shingle-verify joins is CORPUS-sized, and Catalyst's static
    estimate of the pruned scan underestimates the materialized array
    columns so badly that it auto-broadcast all three — at 50k docs
    the broadcast build OOM'd a default-memory driver, and AQE cannot
    demote a statically-planned BroadcastHashJoin. When corpus_rows
    is unknown (None) or fails the 32 MiB budget, every corpus join
    must pin to sort-merge, which streams and spills at any scale."""
    from etl_work_flow_for_big_data_spark.catalog import load_table
    from etl_work_flow_for_big_data_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    for rows in (None, 50_000):
        df = minhash_lsh_pairs(
            d, "text", "doc_id", k=5, n_hashes=12, n_bands=4,
            threshold=0.5, corpus_rows=rows,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, (rows, plan)
        assert plan.count("SortMergeJoin") >= 3, (rows, plan)


def test_tpch_q21_plan(spark, sf_dir):
    """Q21's double decorrelation must compile to hash/merge semi- and
    anti-joins (equi on orderkey with the supplier-inequality as a
    residual join condition) and a TakeOrderedAndProject top-20 —
    never a nested loop, never a global sort."""
    plan = _plan(spark, sf_dir, "tpch_q21_waiting_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_maybe_merge_gate_both_regimes(spark, sf_dir):
    """catalog.maybe_merge: provably small ⇒ unhinted (broadcast plan
    survives); big per-row price or unstat-able path ⇒ merge pin."""
    from etl_work_flow_for_big_data_spark.catalog import load_table, maybe_merge

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    small = o.join(maybe_merge(li, sf_dir, "lineitem", bytes_per_row=48),
                   o.o_orderkey == F.col("l_orderkey"))
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan

    # a per-row price that blows the 32 MiB budget stands in for the
    # ~sf1 fixture (6M-row lineitem) without materializing one
    big = o.join(maybe_merge(li, sf_dir, "lineitem", bytes_per_row=10**9),
                 o.o_orderkey == F.col("l_orderkey"))
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan, plan

    # unstat-able table name ⇒ the scale-safe pin
    ghost = o.join(maybe_merge(li, sf_dir, "no_such_table"),
                   o.o_orderkey == F.col("l_orderkey"))
    plan = ghost._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan, plan


def test_size_gated_subqueries_recover_broadcast_at_dim_scale(spark, sf_dir):
    """The three r12 merge-pinned relational queries (subquery_exists,
    subquery_scalar, tpch_q18) run through maybe_merge now: at fixture
    scale the footer-count price clears the budget, so the fast
    broadcast plan is back (VERDICT r12 #3 'recover their r11
    times')."""
    for name in ("subquery_exists", "subquery_scalar", "tpch_q18_large_orders"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)


def test_dedup_embedding_ann_plan(spark, sf_dir):
    """The r13 scale path for embedding dedup: bucket equi-join (hash
    join, never a nested-loop), and the documents anti-join stays an
    equi-join. At fixture scale the vector table is provably dim-sized
    so broadcasts are fine; with corpus_rows unknown the self-join
    must pin to sort-merge."""
    plan = _plan(spark, sf_dir, "dedup_embedding_ann")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    from etl_work_flow_for_big_data_spark.catalog import load_table
    from etl_work_flow_for_big_data_spark.operators.similarity import (
        ann_near_dup_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(F.size("embedding") == 64)
    for probe in (False, True):
        pairs = ann_near_dup_pairs(
            e, "vec_id", "embedding", corpus_rows=None, multi_probe=probe
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, (probe, plan)
        assert "SortMergeJoin" in plan, (probe, plan)

    # the h1 REGISTERED query shares the small-regime shape: hash
    # join on the probe buckets, never a nested loop
    plan = _plan(spark, sf_dir, "dedup_embedding_ann_h1")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_text_queries_no_extra_exchange(spark, sf_dir):
    """Text analysis is pure per-row expression work: the ONLY shuffle
    allowed is the output sort's range partitioning. A hash Exchange
    creeping in means an accidental aggregation/repartition in what
    must stay a map-only pipeline at 100 TB."""
    for name in (
        "text_quality",
        "text_lang_id",
        "text_fingerprint",
        "text_token_regex",
        "text_chunk",
    ):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Exchange") <= 1, f"{name} gained a shuffle:\n{plan}"
        assert "Exchange hashpartitioning" not in plan, name
    # text_tokens aggregates (token histogram): one hash Exchange for
    # the agg plus the output sort — still no third shuffle
    plan = _plan(spark, sf_dir, "text_tokens")
    assert plan.count("Exchange") <= 2


def test_pipeline_utility_plans(spark, sf_dir):
    """New training-pipeline utilities keep their promised shapes:
    scrub and split are map-only (zero Exchange), packing pays exactly
    its one window shuffle."""
    for name, max_ex in (
        ("text_scrub", 0),
        ("split_assign", 0),
        ("mix_weighted", 0),
        ("pack_sequences", 1),
        ("pack_sequences_bucketed", 1),
        ("route_assign", 0),
    ):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("Exchange") <= max_ex, f"{name}:\n{plan}"
    # r14 (VERDICT r13 #3): route_assign must be pure map — the r13
    # per-route row_number planned a partition-per-route sort, i.e.
    # each route's ENTIRE history through one task. The hash slot
    # needs no Window and no Sort at all.
    plan = _plan(spark, sf_dir, "route_assign")
    assert "Window" not in plan and "Sort" not in plan, plan


def test_llm_clean_corpus_join_discipline(spark, sf_dir):
    """Flagship corpus-prep plan: the only sort-merge join allowed is
    the shingle self-join (both sides are the full inverted index —
    broadcast impossible by design); everything else must broadcast.
    Document text itself must never be a shuffle key."""
    plan = _plan(spark, sf_dir, "llm_clean_corpus")
    assert plan.count("SortMergeJoin") <= 1
    assert plan.count("BroadcastHashJoin") >= 3
    # exprIds render as text#NNN; text_hash digests may shuffle, raw
    # text must not
    assert not re.search(r"hashpartitioning\(text#", plan)


def test_exact_jaccard_queries_are_max_df_bounded(spark, sf_dir):
    """Every registered query that runs exact n-gram Jaccard must carry
    the MAX_DF stop-shingle bound: without it, one boilerplate shingle
    shared by d documents contributes d²/2 candidate pairs and the
    candidate stage is quadratic at 100 TB. The bound shows up in the
    optimized plan as a document-frequency filter (count(...) <= MAX_DF
    post-aggregation) feeding the index join. (dedup_components uses
    the same bounded pair stage but localCheckpoints each round, so its
    final plan is a LogicalRDD — the bound is pinned here via the other
    three call sites and the behavioral test below.)"""
    from etl_work_flow_for_big_data_spark.queries.text import MAX_DF

    for name in ("dedup_ngram", "dedup_apply", "llm_clean_corpus"):
        df = REGISTRY[name].fn(spark, sf_dir)
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert f"<= {MAX_DF}" in optimized, f"{name} lost its max_df bound"


def test_max_df_drops_stop_shingles(spark):
    """Behavioral pin for the bound: a shingle present in every doc is
    excluded from pairing once df exceeds max_df, while rare-shingle
    overlap still pairs."""
    from etl_work_flow_for_big_data_spark.operators.dedup import ngram_jaccard_pairs

    common = "a b c d e"  # one 5-gram shared by ALL docs
    rows = [
        (1, common + " x1 x2 x3 x4"),
        (2, common + " x1 x2 x3 x4"),  # true near-dup of 1
        (3, common + " y1 y2 y3 y4"),
        (4, common + " z1 z2 z3 z4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # cross-doc pairs share only the universal shingle: jaccard = 1/9
    unbounded = ngram_jaccard_pairs(df, "text", "doc_id", k=5, threshold=0.1)
    bounded = ngram_jaccard_pairs(
        df, "text", "doc_id", k=5, threshold=0.1, max_df=3
    )
    # unbounded: the universal shingle pairs everything (6 pairs)
    assert unbounded.count() == 6
    # bounded: only the genuinely duplicated docs pair
    assert [(r.d1, r.d2) for r in bounded.collect()] == [(1, 2)]


def test_window_ntile_no_single_partition_sort(spark, sf_dir):
    """Global quantile binning must NOT funnel DATA through a
    single-partition window: distributed_ntile's ranking window
    partitions by the frozen range partition id. The one permitted
    SinglePartition exchange is the prefix-sum over the per-range
    COUNTS aggregate (bounded at n_parts rows by construction — the
    r6 fused-offsets broadcast subplan); it must sit directly above
    that counts aggregate, and the ranking window's own exchange must
    stay hash-partitioned."""
    plan = _plan(spark, sf_dir, "window_ntile")
    segments = plan.split("Exchange SinglePartition")
    assert len(segments) <= 2, f"multiple SinglePartition exchanges:\n{plan}"
    if len(segments) == 2:
        # the subtree below the exchange starts right after it; its
        # first aggregate must be the per-range count — row-bounded
        below = segments[1]
        first_agg = below[below.index("HashAggregate") :].split("\n", 1)[0]
        assert "__pid" in first_agg and "count" in first_agg, plan
    # the data path: ranking window partitioned by range id, never 1
    assert "hashpartitioning(__pid" in plan, plan


def test_sim_pairs_plans_executor_side_grid(spark, sf_dir):
    """The exact all-pairs baseline must stay executor-side: its plan
    is two explode legs meeting in a FlatMapCoGroupsInPandas — exactly
    one exchange per leg (hash on the grid key), and no broadcast of
    vector data, which would mean a driver relay crept back in."""
    plan = _plan(spark, sf_dir, "sim_pairs")
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert plan.count("Exchange") == 2, plan
    assert "Broadcast" not in plan, plan


def test_distributed_ntile_rejects_reserved_columns(spark):
    """An input already carrying a working-column name would silently
    corrupt ranks (or throw an ambiguous-reference error mid-plan);
    the operator must refuse it at the boundary."""
    from etl_work_flow_for_big_data_spark.operators.transforms import (
        distributed_ntile,
    )

    df = spark.range(10).select(
        F.col("id"), F.lit(0).alias("__total")
    )
    with pytest.raises(ValueError, match="reserves column"):
        distributed_ntile(df, ["id"], 4)


def test_distributed_ntile_matches_global_ntile(spark):
    """Bit-equality pin: distributed_ntile reproduces NTILE(k) OVER
    (ORDER BY ...) exactly, including the uneven-bucket closed form
    (N % k leading buckets one row larger)."""
    from pyspark.sql import Window as W

    from etl_work_flow_for_big_data_spark.operators.transforms import (
        distributed_ntile,
    )

    # N=10, k=4 → bucket sizes 3,3,2,2; scrambled insert order
    rows = [(i * 37 % 10, float((i * 37 % 10) * 2)) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "v"])
    want = {
        (r.id, r.q)
        for r in df.select(
            "id", F.ntile(4).over(W.orderBy("v", "id")).alias("q")
        ).collect()
    }
    got = {
        (r.id, r.q)
        for r in distributed_ntile(
            df, [F.col("v"), F.col("id")], 4, out_col="q", n_parts=3
        ).collect()
    }
    assert got == want


def test_distributed_ntile_fast_path_adversarial_keys(spark):
    """The literalized-split-points fast path must match global NTILE
    on adversarial numeric keys: heavy ties (hot value spanning a
    split point), nulls (sort first), NaN (sorts LAST in Spark
    ordering but compares false against every split), and a
    constant-key corpus (no usable split points)."""
    from pyspark.sql import Window as W

    from etl_work_flow_for_big_data_spark.operators.transforms import (
        distributed_ntile,
    )

    vals = (
        [5.0] * 9  # hot tie value
        + [None, None]
        + [float("nan"), float("nan")]
        + [1.0, 2.0, 3.0, 7.0, 8.0, 9.0, 10.0]
    )
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    want = {
        (r.id, r.q)
        for r in df.select(
            "id", F.ntile(4).over(W.orderBy("v", "id")).alias("q")
        ).collect()
    }
    got = {
        (r.id, r.q)
        for r in distributed_ntile(
            df,
            [F.col("v"), F.col("id")],
            4,
            out_col="q",
            n_parts=5,
            strategy="split_points",
        ).collect()
    }
    assert got == want

    const = spark.createDataFrame([(i, 1.0) for i in range(7)], "id long, v double")
    want_c = {
        (r.id, r.q)
        for r in const.select(
            "id", F.ntile(3).over(W.orderBy("v", "id")).alias("q")
        ).collect()
    }
    got_c = {
        (r.id, r.q)
        for r in distributed_ntile(
            const,
            [F.col("v"), F.col("id")],
            3,
            out_col="q",
            n_parts=4,
            strategy="split_points",
        ).collect()
    }
    assert got_c == want_c


def test_distributed_ntile_fast_path_no_materialization(spark):
    """The numeric fast path must not localCheckpoint the dataset: the
    input's logical lineage (here a Range source) survives into the
    final plan instead of being truncated to a checkpoint RDD barrier.
    (The constant-size offsets table is a LogicalRDD by construction —
    only the DATA branch's lineage matters.)"""
    from etl_work_flow_for_big_data_spark.operators.transforms import (
        distributed_ntile,
    )

    df = spark.range(100).select(
        "id", (F.col("id") % 13).cast("double").alias("v")
    )
    out = distributed_ntile(
        df, [F.col("v"), F.col("id")], 4, out_col="q", n_parts=4,
        strategy="split_points",
    )
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Range (0, 100" in optimized, optimized
    # and the split points are plan literals, not a recomputed subquery
    assert "approx" not in optimized.lower()


def test_join_salted_spreads_hot_key(spark, sf_dir):
    """The salted join's shuffle keys include the salt (hot key spread
    over n_salts reducers) while the oracle-identical result carries no
    salt column."""
    df = REGISTRY["join_salted"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert "__salt" not in df.columns


def test_distributed_ntile_fast_path_edge_inputs(spark):
    """Edge inputs the split-points strategy must survive: plain string
    order columns, ±inf keys (no SQL literal for inf — splits filtered
    to finite, keys compare correctly), and explicit split_points with
    n_parts=1 (degenerate single range, still no materialization)."""
    from pyspark.sql import Window as W

    from etl_work_flow_for_big_data_spark.operators.transforms import (
        distributed_ntile,
    )

    df = spark.range(50).select("id", (F.col("id") % 7).cast("double").alias("v"))
    assert (
        distributed_ntile(
            df, ["v", "id"], 4, out_col="q", n_parts=4, strategy="split_points"
        ).count()
        == 50
    )

    inf = spark.createDataFrame(
        [(1, float("inf")), (2, float("-inf")), (3, 1.0), (4, 2.0), (5, 3.0), (6, 4.0)],
        "id long, v double",
    )
    want = {
        (r.id, r.q)
        for r in inf.select(
            "id", F.ntile(3).over(W.orderBy("v", "id")).alias("q")
        ).collect()
    }
    got = {
        (r.id, r.q)
        for r in distributed_ntile(
            inf, [F.col("v"), F.col("id")], 3, out_col="q", n_parts=3,
            strategy="split_points",
        ).collect()
    }
    assert got == want

    one = distributed_ntile(
        df, [F.col("v"), F.col("id")], 4, out_col="q", n_parts=1,
        strategy="split_points",
    )
    assert "Range (0, 50" in one._jdf.queryExecution().optimizedPlan().toString()
    assert one.count() == 50


def test_dq_validate_lazy_single_scan(spark, sf_dir):
    """dq_validate must compose lazily like every operator — building
    the DataFrame runs NO job (the old implementation collected the
    aggregate at plan-build time) — and the unpivot must be a generator
    over the single aggregate row, never a per-rule union that clones
    the aggregate: exactly ONE scan of the source in the final plan."""
    from etl_work_flow_for_big_data_spark.catalog import load_table
    from etl_work_flow_for_big_data_spark.operators.transforms import dq_validate

    # load (and schema-infer) OUTSIDE the snapshot: parquet footer
    # reads are the catalog's jobs, not the operator's
    li = load_table(spark, sf_dir, "lineitem")
    _ = li.schema
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    out = dq_validate(li, [("qty_positive", "l_quantity > 0")])
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after, "dq_validate ran a job at plan-build time"
    # the registered query (4 rules) must still plan exactly one scan
    plan = _plan(spark, sf_dir, "dq_validate")
    assert plan.count("Scan parquet") == 1, plan
    assert "Generate explode" in plan, plan
    assert out.count() == 1


def test_distributed_ntile_property_random_inputs(spark):
    """Property sweep: distributed_ntile must be bit-equal to
    NTILE(k) OVER (ORDER BY v, id) for ANY key distribution — heavy
    ties, skewed clusters, negatives, uneven N%k remainders — across
    every (n_parts, k) shape, including n_parts > distinct keys.
    (Deterministic seeded cases rather than hypothesis: each case
    costs two Spark jobs, so a bounded sweep keeps suite time sane.)"""
    import random

    from pyspark.sql import Window as W

    from etl_work_flow_for_big_data_spark.operators.transforms import (
        distributed_ntile,
    )

    rng = random.Random(20260813)
    cases = [
        # (n_rows, key_gen, n_buckets, n_parts)
        (97, lambda: float(rng.randint(0, 3)), 4, 8),      # heavy ties
        (200, lambda: rng.gauss(0.0, 1.0), 7, 5),          # continuous
        (50, lambda: float(rng.choice([-5, 0, 1000])), 3, 16),  # skew+neg
        (64, lambda: 42.0, 5, 4),                          # constant key
        (23, lambda: float(rng.randint(-10, 10)), 23, 32), # k == N
    ]
    for n_rows, gen, k, n_parts in cases:
        rows = [(i, gen()) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "id long, v double")
        want = {
            (r.id, r.q)
            for r in df.select(
                "id", F.ntile(k).over(W.orderBy("v", "id")).alias("q")
            ).collect()
        }
        got = {
            (r.id, r.q)
            for r in distributed_ntile(
                df, [F.col("v"), F.col("id")], k, out_col="q", n_parts=n_parts
            ).collect()
        }
        assert got == want, f"case n={n_rows} k={k} parts={n_parts}"


# ---------------------------------------------------------------------------
# Registry-wide shuffle budget. The targeted tests above pin the ONE
# plan property each headline query lives or dies by; this pins an
# Exchange-count ceiling for EVERY registered query, so an edit that
# quietly adds a shuffle anywhere in the registry goes red with the
# query's name — plan-quality regression as a unit failure, not a
# bench archaeology session. Counts are the static (pre-AQE) physical
# plan at sf0.001; they are ceilings, not equalities, so AQE runtime
# coalescing and future shuffle REMOVALS stay green. If the driver
# regenerates fixtures at very different sizes, static broadcast
# decisions can flip a dim join to SMJ and trip a ceiling — that is a
# real plan change worth a deliberate re-baseline, not noise.

# r15 re-baseline: queries whose heavy stage is wrapped in
# catalog.fan_out (input-layout-adaptive repartition before the
# tokenize/shingle/md5/kernel compute) gain exactly ONE round-robin
# exchange at fixture scale, where every table is a single-split file
# (sim_ivf_nprobe gains two — corpus assignment + query-rows kernel
# passes). At >= cores input splits fan_out is a no-op and these
# ceilings are loose by one.
EXCHANGE_BUDGET = {
    "window_rank": 1,
    "agg_rollup": 1,
    "agg_cube": 1,
    "join_left": 1,
    "join_semi": 0,
    "agg_distinct": 2,
    "agg_conditional": 1,
    "agg_stats": 1,
    "agg_pivot": 2,
    "agg_unpivot": 1,
    "profile_columns": 6,
    "set_union": 6,
    "sort_multi": 0,
    "topk": 1,
    "parse_json": 0,
    "rate_charge": 1,
    "agg_groupby": 1,
    # r14 single-pass ngram pairs: the final label/root plan reads the
    # checkpointed edges; the root anti-join plans SMJ statically (the
    # cached candidate aggregate's pre-materialization stats inherit
    # the explode pipeline's estimate), AQE demotes at runtime
    "dedup_components": 2,
    "agg_grouping_sets": 1,
    "case_map": 0,
    "cast_types": 0,
    "decontaminate": 3,
    "dq_validate": 1,
    "filter_bitmask": 0,
    "join_broadcast": 1,
    "join_salted": 0,
    "mix_weighted": 0,
    "mm_binary_meta": 0,
    "mm_decode": 1,
    "pack_sequences": 1,
    "pack_sequences_bucketed": 1,
    "route_assign": 0,
    "sim_ann_lsh": 1,
    "sim_ann_multiprobe": 2,
    "split_assign": 0,
    "text_scrub": 0,
    "text_token_regex": 0,
    "text_tokens": 1,
    "ts_gapfill": 2,
    "mm_features": 1,
    "mm_frames": 1,
    "mm_resize": 1,
    "parse_kv": 0,
    "serialize_kv": 0,
    "filter_required": 0,
    "project_rename": 0,
    "scalar_string_date": 0,
    "serialize_json": 0,
    "join_anti": 0,
    "join_star": 1,
    "join_range": 1,
    "join_asof": 1,
    "agg_approx_distinct": 2,
    "window_analytic": 1,
    # subquery_exists/scalar re-baselined back to 2/2 in r13: the r12
    # unconditional merge pins (4/3 exchanges) are size-gated now —
    # at fixture scale the footer-count price clears the 32 MiB
    # budget, so the broadcast plan returns; the merge form reappears
    # automatically when the bounding table outgrows the budget
    # (test_maybe_merge_gate_both_regimes pins both regimes)
    "subquery_exists": 2,
    "subquery_scalar": 2,
    "tpch_q3_shipping_priority": 1,
    "tpch_q10_returned_items": 1,
    "tpch_q12_priority_by_tier": 1,
    "null_handling": 0,
    "agg_approx_quantile": 1,
    "tpch_q14_promo_share": 1,
    "tpch_q22_idle_customers": 3,
    "tpch_q5_local_supplier_volume": 1,
    # re-baselined back to 1 in r13 (was 2 in r12): the large-order
    # aggregate's merge pin is size-gated on the orders footer count,
    # so at fixture scale it broadcasts again; only the pre-aggregate
    # hash exchange remains
    "tpch_q18_large_orders": 1,
    # Q21 shape (r13): late-set derivation + semi/anti probes
    # broadcast at fixture scale (all sides size-gated); the 3
    # exchanges are the groupBy + the two late-set branches
    "tpch_q21_waiting_suppliers": 3,
    "merge_upsert": 1,
    "window_ntile": 3,
    "window_range_frame": 1,
    "sim_topk": 1,
    # same mapInPandas-scan + single window exchange as sim_topk; the
    # quantization is a narrow per-row expression inside the scan
    "sim_topk_quantized": 1,
    "sim_pairs": 2,
    # pair grid (2) + the drop-set distinct (1) + the anti-join's
    # exchange (1); the drop set is near-dup-count-sized, so at scale
    # AQE demotes that join to broadcast and the plan loses, not
    # gains, an Exchange
    "dedup_embedding": 4,
    # ANN path (r13): the bucket self-join broadcasts at fixture
    # scale (gate clears), leaving the drop-set distinct + anti-join
    # exchanges; the big-regime sort-merge form is pinned by
    # test_dedup_embedding_ann_plan
    "dedup_embedding_ann": 3,
    # same plan shape — the Hamming-1 probe fan is a per-row explode
    # on the already-broadcast/hinted left side, no extra shuffle
    "dedup_embedding_ann_h1": 3,
    "sim_ivf_topk": 3,
    # sim_ivf_topk's 3 plus the probe-set union/distinct exchange
    # (query-side only; the corpus-side index path is unchanged)
    "sim_ivf_nprobe": 4,
    # the SERVE plan (build is a separate write job): 3 broadcast
    # exchanges (query⋈probe-literal, then the query side into the
    # pruned postings scan) + the top-k window's single hash
    # partition — the kernel probe pass is collected pre-plan, so
    # the final job has NO mapInPandas and ONE shuffle
    "sim_ivf_persisted": 4,
    # identical serve plan — the wider probe set is still a collected
    # literal, only the isin/partition-filter list grows
    "sim_ivf_persisted_nprobe": 4,
    # trained build serves at probe-ALL: same query-side plan shape as
    # the persisted nprobe form (probe kernel + pruned postings scan +
    # broadcast join + rank window)
    "sim_ivf_trained": 4,
    "text_quality": 0,
    "text_lang_id": 0,
    "text_fingerprint": 0,
    "dedup_exact": 1,
    # re-baselined 6 -> 2 in r14: the combinations explode emits
    # self-pairs so intersection counts AND per-doc sizes come from ONE
    # counted aggregate (persisted); the index pipeline that previously
    # re-derived per join alias (3x scan+shuffle) now runs once
    "dedup_ngram": 3,
    # re-baselined 7 → 1 in r13: the r12 unconditional merge pins are
    # now size-gated on the parquet-footer doc count (catalog
    # maybe_merge pattern), so at fixture scale the broadcast plan is
    # back and only the candidate-distinct exchange remains; the
    # big/unknown-corpus sort-merge form (7 exchanges, the plan that
    # completes at 50k+ docs) is pinned separately by
    # test_dedup_minhash_big_regime_never_broadcasts_corpus
    "dedup_minhash": 2,
    "dedup_simhash": 0,
    "text_chunk": 0,
    # re-baselined 7 -> 4 in r14 (single-pass ngram pairs, see
    # dedup_ngram)
    "dedup_apply": 5,
    # groupBy(passage hash) + per-doc reassembly agg; the occ join
    # broadcasts at fixture scale (ceiling leaves room for the SMJ
    # form when the occurrence side outgrows broadcast)
    "dedup_passages": 3,
    # re-baselined 11 -> 6 in r14 (single-pass ngram pairs, see
    # dedup_ngram)
    "llm_clean_corpus": 7,
    "text_editdist": 0,
    "window_tumbling": 1,
    "window_sliding": 1,
    "window_session": 1,
    # one hashpartitioning(source) exchange; Partial WindowGroupLimit
    # runs map-side before it (plan-asserted separately)
    "sample_quota": 1,
    # (doc_id, word) combine exchange + the per-doc rollup exchange,
    # which ships one row per document
    "text_repetition": 2,
}


def _count_exchanges(df) -> int:
    import io
    import re as _re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return len(_re.findall(r"^\s*\(\d+\)\s+Exchange\b", buf.getvalue(), _re.M))


def test_exchange_budget_names_every_query():
    from etl_work_flow_for_big_data_spark.queries import load_all

    assert sorted(EXCHANGE_BUDGET) == sorted(load_all()), (
        "every registered query needs a pinned Exchange ceiling — add "
        "new queries to EXCHANGE_BUDGET with their measured count"
    )


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_exchange_budget(name, spark, sf_dir):
    from etl_work_flow_for_big_data_spark.queries import load_all

    # cold-plan canonical shape: once a query's persisted intermediate
    # (e.g. the r14 ngram candidate-count cache) is MATERIALIZED by an
    # earlier test, explain renders the cached subtree's Final AND
    # Initial AQE plans and the regex double-counts its exchanges —
    # clearing the cache first makes the count test-order-independent
    spark.catalog.clearCache()
    n = _count_exchanges(load_all()[name].fn(spark, sf_dir))
    assert n <= EXCHANGE_BUDGET[name], (
        f"{name}: physical plan has {n} Exchanges, budget is "
        f"{EXCHANGE_BUDGET[name]} — an extra shuffle crept into the plan "
        "(or a deliberate change needs a re-baseline here)"
    )


def test_ngram_pairs_single_index_pipeline(spark, sf_dir):
    """r14: the bounded ngram-Jaccard path derives intersection counts
    AND per-doc shingle sizes from ONE counted aggregate (self-pairs in
    the combinations explode), cached for its three join consumers.
    Before, `sizes`' two aliases plus `inter` re-derived the full
    scan->explode->shuffle(sh)->window->collect_list pipeline three
    times. Pin: exactly one distinct Window node (the df-bound) and one
    distinct parquet scan in dedup_ngram's formatted plan, and the
    shared InMemoryRelation is present."""
    import io
    from contextlib import redirect_stdout

    spark.catalog.clearCache()  # cold plan shape (see test_exchange_budget)
    df = REGISTRY["dedup_ngram"].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    window_ids = set(re.findall(r"^\s*\((\d+)\)\s+Window\b", plan, re.M))
    scan_ids = set(re.findall(r"^\s*\((\d+)\)\s+Scan parquet", plan, re.M))
    assert len(window_ids) == 1, f"df-bound window duplicated: {window_ids}"
    assert len(scan_ids) == 1, f"index scan duplicated: {scan_ids}"
    assert "InMemoryRelation" in plan
