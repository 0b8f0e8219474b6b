"""Bucketed sequence-packing contract — the coded remedy for
pack_sequences' documented serial funnel (a per-lang prefix sum cannot
parallelize within its window key; at 100 TB "en" flows through ONE
task). operators.transforms.pack_sequences(n_buckets=...) subdivides
the window key with a deterministic md5 hash bucket of the id, so each
(lang, bucket) packs independently and concurrently.

The contract pinned here: within every bucket, the bucketed assignment
is IDENTICAL to running the unbucketed packer on that bucket's rows
alone — verified against an independent pure-Python prefix-sum oracle
(not through the operator itself), plus partition-count invariance and
the plan-level evidence that the shuffle key actually gained the
bucket column (the funnel-gone guarantee a wall-clock probe can only
suggest).
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.catalog import load_table
from etl_work_flow_for_big_data_spark.functions.text import token_count
from etl_work_flow_for_big_data_spark.operators.transforms import (
    hash_bucket,
    pack_sequences,
)
from etl_work_flow_for_big_data_spark.queries import load_all

REGISTRY = load_all()

BUDGET = 512


def _python_pack(rows):
    """Independent prefix-sum oracle: rows = [(doc_id, n_tokens)]
    in any order; returns {doc_id: seq_id}. Matches the window
    semantics: id-ordered running sum over NON-NULL token counts;
    a null token count yields a null seq_id and adds nothing."""
    out = {}
    run = 0
    for doc_id, n in sorted(rows, key=lambda r: r[0]):
        if n is None:
            out[doc_id] = None
            continue
        run += n
        out[doc_id] = int(math.floor((run - n) / float(BUDGET)))
    return out


def _tokenized(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", token_count(F.col("text")).cast("int").alias("n_tokens")
    )


def test_bucketed_packing_matches_per_bucket_prefix_sum_oracle(spark, sf_dir):
    got = REGISTRY["pack_sequences_bucketed"].fn(spark, sf_dir).collect()
    assert len(got) > 0
    groups = defaultdict(list)
    for r in got:
        groups[(r.lang, r.bucket)].append((r.doc_id, r.n_tokens))
    assert len(groups) > 1, "fixture produced a single (lang, bucket) group"
    expected = {}
    for key, rows in groups.items():
        for doc_id, seq in _python_pack(rows).items():
            expected[doc_id] = seq
    for r in got:
        assert r.seq_id == expected[r.doc_id], (r.doc_id, r.lang, r.bucket)


def test_bucketed_equals_unbucketed_run_on_that_buckets_rows(spark, sf_dir):
    """The load-bearing claim: sequences never span buckets, so
    subdividing the key changes WHERE the work runs, not WHAT a
    bucket's rows are assigned — unbucketed packing of one bucket's
    rows reproduces the bucketed result exactly."""
    t = _tokenized(spark, sf_dir)
    bucketed = {
        r.doc_id: (r.bucket, r.seq_id)
        for r in pack_sequences(t, n_buckets=8).collect()
    }
    probe_buckets = sorted({b for b, _ in bucketed.values()})[:3]
    for b in probe_buckets:
        subset = t.filter(hash_bucket(F.col("doc_id"), 8) == b)
        solo = {r.doc_id: r.seq_id for r in pack_sequences(subset).collect()}
        assert solo, f"bucket {b} empty"
        for doc_id, seq in solo.items():
            assert bucketed[doc_id] == (b, seq), (b, doc_id)


def test_bucketed_packing_partition_count_invariant(spark, sf_dir):
    t = _tokenized(spark, sf_dir)
    a = {
        (r.doc_id, r.lang, r.bucket, r.n_tokens, r.seq_id)
        for r in pack_sequences(t.repartition(2), n_buckets=8).collect()
    }
    b = {
        (r.doc_id, r.lang, r.bucket, r.n_tokens, r.seq_id)
        for r in pack_sequences(t.repartition(17), n_buckets=8).collect()
    }
    assert a == b


def test_bucketed_window_shuffles_on_lang_and_bucket(spark, sf_dir):
    """Structural funnel-gone evidence: the window exchange must hash
    on (lang, bucket), not lang alone — the plan property that makes
    per-lang packing n_buckets-wide on a cluster."""
    df = REGISTRY["pack_sequences_bucketed"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"hashpartitioning\(lang#\d+, bucket#\d+", plan), plan
    # and the unbucketed form still hashes on lang alone (the contract
    # this operator exists to relax)
    base = REGISTRY["pack_sequences"].fn(spark, sf_dir)
    base_plan = base._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(lang#\d+,\s*\d+\)", base_plan), base_plan
