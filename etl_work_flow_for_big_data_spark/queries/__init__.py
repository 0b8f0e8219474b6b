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
# which queries receive a hard oracle check. Round-6 rotation
# (VERDICT r5 "Next round" #1): queries whose implementation changed
# this round lead (they need a fresh hash check), then the 34 queries
# whose last hard check is round 4 (join/agg/window/relational
# families), so no query's latest check is ever older than two rounds.
# Names absent from this list (the r5-green, untouched set) keep
# registration order at the back; NEW/CHANGED queries must be added to
# the front to receive a slot.
_CHECK_PRIORITY = [
    # -- implementation touched in round 6 (wire predicate grew an
    #    optional sign; cosine_pairs went executor-side; connected
    #    components got the two-phase default; NTILE stats fused;
    #    minhash seed binding fixed + integer-exact ratio rounding
    #    across the text/dedup family)
    "dedup_minhash",
    "text_quality",
    "text_lang_id",
    "dedup_ngram",
    "dedup_apply",
    "llm_clean_corpus",
    "dedup_simhash",
    "text_chunk",
    "filter_required",
    "project_rename",
    "sim_pairs",
    "sim_topk",
    "sim_ivf_topk",
    "dedup_components",
    "window_ntile",
    "scalar_string_date",
    "agg_approx_quantile",
    "mm_features",
    "mm_frames",
    "mm_resize",
    # -- events family hardened late in round 6 (total wire/JSON
    #    semantics under adversarial fixtures): fresh checks required
    "parse_kv",
    "serialize_kv",
    "serialize_json",
    "parse_json",
    "window_tumbling",
    "window_sliding",
    "window_session",
    # -- fuzz-sweep fixes at round close (scripts/fuzz_parity.py):
    #    byte-level levenshtein pin; ASCII-fold fingerprint
    #    normalization (Spark full-Unicode lower vs duck simple
    #    mapping); window_analytic stays in the stale block below
    #    (its oracle NULLS FIRST pin changed too)
    "text_editdist",
    "text_fingerprint",
    "dedup_exact",
    # -- integer-exact rounded means (fuzz seed 61016: small-group
    #    ROUND(AVG) half-boundary split)
    "rate_charge",
    "agg_groupby",
    # -- last hard check is round 4 (r5 spent its 50 slots on the
    #    then-stale r3 set plus its own perf-touched queries). Final
    #    r6 arithmetic: 32 r6-touched above + the 18 kept-stale below
    #    fill all 50 slots; the remaining 14 r4-checked queries defer
    #    to r7 via the tail (see its note) and MUST lead its rotation
    #    — changed implementations outrank stale-but-unchanged ones,
    #    and every deferred query is still oracle-checked at sf0.001
    #    by tests/test_oracle_parity.py (and on adversarial/fuzz
    #    tables by tests/test_adversarial_corpus_parity.py and
    #    tests/test_fuzz_parity.py) every round.
    "join_anti",
    "join_asof",
    "join_range",
    "join_star",
    "merge_upsert",
    "agg_approx_distinct",
    "null_handling",
    "subquery_exists",
    "subquery_scalar",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_tier",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q22_idle_customers",
    "window_analytic",
    "window_range_frame",
    # -- deferred tail (see note above): the 32 touched + 18 kept-stale
    #    entries fill all 50 slots, so these fourteen defer to round 7
    #    (they must LEAD the r7 rotation). Deferral picks, lowest risk
    #    first: window_rank (property-pinned next to the
    #    freshly-rechecked window_analytic; its DESC null ordering
    #    already agrees across engines without a pin),
    #    agg_rollup/agg_cube (grouping-sets sibling agg_grouping_sets
    #    IS freshly checked — same ROLLUP/CUBE machinery),
    #    join_left/join_semi (plan-asserted in pytest; siblings
    #    join_anti/join_star/join_range keep their slots). Every
    #    deferred query is still oracle-checked at sf0.001 by
    #    tests/test_oracle_parity.py and fuzz-swept per round.
    "window_rank",
    "agg_rollup",
    "agg_cube",
    "join_left",
    "join_semi",
    "agg_distinct",
    "agg_conditional",
    "agg_stats",
    "agg_pivot",
    "agg_unpivot",
    "profile_columns",
    "set_union",
    "sort_multi",
    "topk",
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
