"""Query registry: one entry per SURVEY.md §2 inventory row.

Each registered query is a pair (Spark callable, DuckDB oracle SQL).
The driver harness executes both at sf=0.01 and compares row count,
schema and an order-insensitive value hash — so every computed column
is aliased identically on both sides, floats are rounded identically,
and rankings use rounded keys + deterministic tie-breaks.

Every registered query carries a DuckDB oracle — none opts out: even
the approximate operators (LSH, HLL, IVF) are pinned by oracles over
their exact verification step or a seeded re-derivation.

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
    oracle: str
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str, doc: str = ""):
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
# which queries receive a hard oracle check. Round-8 rotation
# (VERDICT r7 "Next round" #1): round 7 checked exactly the first 50
# of the r7 ordering, leaving 34 queries whose last hard check is
# round 6 — they lead, restoring every query to ≤2-round staleness.
# Round 8 touches no query implementation (its work is test/harness:
# the tws processor unit test, the NULL-mode fuzz wave, the bench
# fast path), so no changed-set slots are needed; the remaining 16
# slots back-fill from the r7-checked set in registration order,
# leaving 34 r7-checked queries as round 9's rotation debt
# (34 + 16 carryover again fits its 50 — the cycle is steady-state).
# Every deferred query is still oracle-checked at sf0.001 by
# tests/test_oracle_parity.py and swept on adversarial + fuzz fixtures
# every round. NEW/CHANGED queries must be added to the front to
# receive a slot.
_CHECK_PRIORITY = [
    # -- last hard check round 6 (deferred by the r7 rotation)
    "join_asof",
    "agg_approx_distinct",
    "window_analytic",
    "subquery_exists",
    "subquery_scalar",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_tier",
    "null_handling",
    "agg_approx_quantile",
    "tpch_q14_promo_share",
    "tpch_q22_idle_customers",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_orders",
    "merge_upsert",
    "window_ntile",
    "window_range_frame",
    "sim_topk",
    "sim_pairs",
    "sim_ivf_topk",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "dedup_exact",
    "dedup_ngram",
    "dedup_minhash",
    "dedup_simhash",
    "text_chunk",
    "dedup_apply",
    "llm_clean_corpus",
    "text_editdist",
    "window_tumbling",
    "window_sliding",
    "window_session",
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
    back = len(_CHECK_PRIORITY)  # unlisted (r6-green) queries keep order, at the back
    ordered = sorted(REGISTRY, key=lambda n: (rank.get(n, back), insertion[n]))
    return {name: REGISTRY[name] for name in ordered}
