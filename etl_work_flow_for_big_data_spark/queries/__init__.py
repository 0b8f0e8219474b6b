"""Query registry: one entry per SURVEY.md §2 inventory row.

Each registered query is a pair (Spark callable, DuckDB oracle SQL).
The driver harness executes both at sf=0.01 and compares row count,
schema and an order-insensitive value hash — so every computed column
is aliased identically on both sides, floats are rounded identically,
and rankings use rounded keys + deterministic tie-breaks.

Queries with no SQL-expressible oracle (LSH bucketing, HLL internals)
register ``oracle=None`` → the driver records a rows-only check.

Ordering contract: queries return UNORDERED results (the relational
set contract). Both the driver's value hash and the local parity
replica canonicalize order themselves, and a cosmetic global sort is
an anti-pattern that doubles the pipeline — Spark's range-partitioning
sort samples the child plan, executing everything upstream twice (and
at 100 TB nobody totally orders a result set; output is written
partitioned). Ordering survives only where it is SEMANTIC: top-k /
sorted-limit queries (TakeOrderedAndProject) and window-function
ORDER BY clauses.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a (spark_fn, oracle_sql) query pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=_tuned(fn), oracle=oracle, doc=doc)
        return fn

    return deco


def _tuned(fn):
    """Wrap a query fn so runtime confs (UTC tz, AQE) apply even on a
    driver-owned SparkSession."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_work_flow_for_big_data_spark.session import tune_session

        tune_session(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


# Driver-check priority. The driver's per-round CORRECTNESS run caps at
# 50 queries in registry-iteration order, so iteration order decides
# which queries receive a hard oracle check. Round-4 rotation
# (VERDICT r3 "Next round" #4): the round-3 red row and the two queries
# changed this round lead, then the 33 queries whose last hard check is
# round 2 (the stale set), so the cumulative record is all-83-green
# within the trailing two rounds. Names absent from this list (the
# r3-green set, freshly checked) keep registration order at the back;
# NEW/CHANGED queries must be added to the front to receive a slot.
_CHECK_PRIORITY = [
    # -- red in round 3 (fixed this round: integer epoch-µs ordering)
    "window_range_frame",
    # -- reshaped this round to a non-empty expected result
    "join_anti",
    # -- NEW this round: dependency-free header decode
    "mm_decode",
    # -- last hard check is round 2 (r3 spent its 50 slots elsewhere)
    "join_left",
    "join_semi",
    "join_star",
    "join_range",
    "join_asof",
    "agg_groupby",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_conditional",
    "agg_stats",
    "window_rank",
    "window_analytic",
    "topk",
    "sort_multi",
    "set_union",
    "agg_cube",
    "subquery_exists",
    "subquery_scalar",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_tier",
    "agg_pivot",
    "agg_unpivot",
    "null_handling",
    "agg_approx_quantile",
    "tpch_q14_promo_share",
    "tpch_q22_idle_customers",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_orders",
    "merge_upsert",
    "profile_columns",
    "dq_validate",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registry population),
    then order the registry by driver-check priority (see
    ``_CHECK_PRIORITY``)."""
    from etl_work_flow_for_big_data_spark.queries import (  # noqa: F401
        multimodal,
        packets,
        relational,
        similarity,
        text,
        windows,
    )

    rank = {name: i for i, name in enumerate(_CHECK_PRIORITY)}
    insertion = {name: i for i, name in enumerate(REGISTRY)}
    back = len(_CHECK_PRIORITY)  # unlisted (r2-green) queries keep order, at the back
    ordered = sorted(REGISTRY, key=lambda n: (rank.get(n, back), insertion[n]))
    return {name: REGISTRY[name] for name in ordered}
