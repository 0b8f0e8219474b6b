"""Similarity-operator unit tests (I3): corpus blocking in
cosine_pairs (driver memory independence from corpus size) and NaN
(zero-norm vector) semantics parity with the engines."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.operators.similarity import cosine_pairs


@pytest.fixture(scope="module")
def vecs(spark):
    # 20 deterministic 4-dim vectors with plenty of high-cosine pairs
    rows = [
        (i, [float((i % 5) + 1), float((i % 3) + 1), 1.0, float(i % 2)])
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_blocked_equals_single_pass(vecs):
    """Splitting the corpus into many blocks (block_size=3 → 7 blocks)
    must produce the identical pair set as the single-collect path —
    each unordered pair emitted exactly once, in the block owning its
    larger id."""
    full = sorted(
        (r["d1"], r["d2"], r["cos_sim"])
        for r in cosine_pairs(vecs, "vec_id", "embedding", 0.8).collect()
    )
    blocked = sorted(
        (r["d1"], r["d2"], r["cos_sim"])
        for r in cosine_pairs(
            vecs, "vec_id", "embedding", 0.8, block_size=3
        ).collect()
    )
    assert full == blocked
    assert len(full) > 0
    assert all(d1 < d2 for d1, d2, _ in full)


def test_zero_norm_vector_excluded_by_contract(spark):
    """A zero vector yields NaN cosine (0/0). Arrow coerces NaN→NULL on
    transfer (pandas NaN == missing), so 'keep NaN like the engines'
    cannot round-trip the kernel; the documented contract instead is
    that zero-norm vectors never pair, enforced EXPLICITLY in the
    kernel (ADVICE r1, kernels.py) — not as a silent prefilter
    side-effect, and identically with or without a prefilter."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 0.9])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        (r["d1"], r["d2"]): r["cos_sim"]
        for r in cosine_pairs(df, "vec_id", "embedding", 0.9).collect()
    }
    assert (2, 3) in rows and rows[(2, 3)] >= 0.9
    assert (1, 2) not in rows and (1, 3) not in rows

    # no-prefilter path (mode='all', raw kernel) applies the same rule
    from etl_work_flow_for_big_data_spark.functions.kernels import (
        pairwise_cosine,
    )

    corpus = [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 0.9])]
    raw = pairwise_cosine(df, "vec_id", "embedding", corpus, mode="all").collect()
    assert all(not math.isnan(r["cos_raw"]) for r in raw)
    assert {(r["d1"], r["d2"]) for r in raw} == {(2, 3), (3, 2)}
