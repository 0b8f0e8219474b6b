"""range_join unit tests (C6): disjointness validation (ADVICE r1,
joins.py) and overlapping-tier semantics via the BNLJ fallback."""

from __future__ import annotations

import pytest

from etl_work_flow_for_big_data_spark.operators.joins import range_join


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0)], "id long, v double"
    )


def test_overlapping_tiers_rejected_on_fast_path(spark, fact):
    tiers = spark.createDataFrame(
        [(0.0, 12.0, "a"), (10.0, 20.0, "b")], "lo double, hi double, tier string"
    )
    with pytest.raises(ValueError, match="tier ranges overlap"):
        range_join(fact, tiers, "v")


def test_overlapping_tiers_full_semantics_on_bnlj_path(spark, fact):
    tiers = spark.createDataFrame(
        [(0.0, 12.0, "a"), (10.0, 20.0, "b")], "lo double, hi double, tier string"
    )
    rows = sorted(
        (r["id"], r["tier"])
        for r in range_join(fact, tiers, "v", assume_disjoint=False).collect()
    )
    # v=15 falls in BOTH [0,12)? no — in [10,20) only; v=5 in [0,12);
    # a value in the overlap zone [10,12) would produce two rows
    assert rows == [(1, "a"), (2, "b")]
    fact2 = spark.createDataFrame([(9, 11.0)], "id long, v double")
    both = sorted(
        r["tier"]
        for r in range_join(fact2, tiers, "v", assume_disjoint=False).collect()
    )
    assert both == ["a", "b"]


def test_disjoint_tiers_fast_path_ok(spark, fact):
    tiers = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 20.0, "b")], "lo double, hi double, tier string"
    )
    rows = sorted(
        (r["id"], r["tier"]) for r in range_join(fact, tiers, "v").collect()
    )
    assert rows == [(1, "a"), (2, "b")]
