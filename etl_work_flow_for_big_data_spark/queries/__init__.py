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
# which queries receive a hard oracle check. PROCESS RULE (adopted
# after the r8 miss, VERDICT r8 "What's wrong" #1): this list is
# re-audited against `git diff` as the LAST commit of every round —
# any query whose engine OR oracle side changed after the list was
# drafted moves to the front before the round closes.
#
# Round-13 rotation (steady state): leads with the round's
# changed/new queries, then the exact 44-query rotation debt VERDICT
# r12 next-round #1 prescribes: every query whose last hard driver
# check was round 11 (CORRECTNESS_r11 minus CORRECTNESS_r12 —
# `_PRIORITY_BASIS` pins that record pair so the guard test derives
# the same set regardless of later snapshots landing on disk).
# Named slots stay ≤50 so every listed query receives a driver check;
# the round's NEW/CHANGED queries occupy the front. Every deferred
# query is still oracle-checked at sf0.001 by
# tests/test_oracle_parity.py and swept on adversarial + fuzz
# fixtures every round. NEW/CHANGED queries must be added to the
# front to receive a slot.
#
# CLOSING AUDIT (r13): the round diff touches engine/oracle surfaces
# via (a) the TWO NEW embedding-dedup queries — dedup_embedding_ann
# (LSH-bucketed candidates → exact cosine verify → keep-lowest-id;
# the scale-safe registered path VERDICT r12 #4 prescribes) and
# dedup_embedding_ann_h1 (the Hamming-1 multi-probe recall lever) —
# front slots; (b) catalog.maybe_merge size-gated join hints replacing
# the r12 unconditional merge pins in operators.dedup
# minhash_lsh_pairs and queries.relational subquery_exists/
# subquery_scalar/tpch_q18 (VERDICT r12 #3: broadcast when the
# bounding table is provably small, merge otherwise — values
# unchanged, strategy changed: all four move to FRONT slots, rule
# over trust); (c) the persisted-IVF index cache refactor
# (_cached_ivf_index: per-(variant, sf_dir) slot with fingerprint
# eviction, ADVICE r12 — build-path change, so sim_ivf_persisted /
# sim_ivf_persisted_nprobe / sim_ivf_trained take FRONT slots again
# despite their r12 green); (d) the NEW tpch_q21_waiting_suppliers
# (sole-late double-decorrelation: EXISTS → semi-join, NOT EXISTS →
# anti-join, all sides size-gated — front slot); (e) sources.registry
# write_jdbc sink + streaming.windows mode-scoped collision check —
# pytest-covered surfaces with no batch oracle. The debt block is
# CORRECTNESS_r11 minus CORRECTNESS_r12 (44 names); 10 changed + 44
# debt = 54 > 50, so the FOUR lowest-risk debt names (_DEBT_CARRY
# below) carry to the r14 window — the unavoidable overflow the guard
# test budgets exactly.
_CHECK_PRIORITY = [
    # -- engine changed / NEW in round 13 (see closing audit above)
    "dedup_embedding_ann",  # NEW in round 13 (ANN-candidate embedding dedup)
    "dedup_embedding_ann_h1",  # NEW in round 13 (Hamming-1 recall lever)
    "dedup_minhash",  # size-gated corpus-join hints (was unconditional merge)
    "subquery_exists",  # size-gated decorrelated-join hint
    "subquery_scalar",  # size-gated decorrelated-join hint
    "tpch_q18_large_orders",  # size-gated build-side hint
    "tpch_q21_waiting_suppliers",  # NEW in round 13 (sole-late decorrelation)
    "sim_ivf_persisted",  # index-cache eviction refactor (build path)
    "sim_ivf_persisted_nprobe",  # same cache slot, multi-probe branch
    "sim_ivf_trained",  # same refactor, "trained" cache variant
    # -- rotation debt: last hard driver check round 11
    "agg_conditional",
    "agg_cube",
    "agg_distinct",
    "agg_groupby",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "agg_unpivot",
    "decontaminate",
    "dedup_embedding",
    "dq_validate",
    "join_anti",
    "join_left",
    "join_range",
    "join_salted",
    "join_semi",
    "join_star",
    "mix_weighted",
    "mm_decode",
    "mm_resize",
    "profile_columns",
    "route_assign",
    "sample_quota",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "sim_ivf_nprobe",
    "sim_ivf_topk",
    "sim_pairs",
    "sim_topk",
    "split_assign",
    "text_repetition",
    "text_scrub",
    "text_token_regex",
    "text_tokens",
    "tpch_q10_returned_items",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "ts_gapfill",
    "window_rank",
]

# The CORRECTNESS record pair (round numbers) the rotation-debt block
# above was derived from: debt == set(CORRECTNESS_r{lo}) -
# set(CORRECTNESS_r{hi}). tests/test_registry_order.py keys its
# derivation to THIS pair — not "the two newest records on disk" — so
# the driver committing the next round's snapshot cannot invalidate a
# priority list that was correct when written (ADVICE r12 #1: the r12
# guard reddened the suite the moment CORRECTNESS_r12.json landed).
# Bump alongside every _CHECK_PRIORITY rewrite at round open.
_PRIORITY_BASIS = (11, 12)

# Debt names that do NOT fit the 50-slot driver window this round
# (changed 10 + debt 44 = 54): the unavoidable overflow, chosen as
# the lowest-risk members (set_union/sort_multi: single-operator
# pure-Catalyst set/sort queries, code-untouched since r6; topk:
# plan-asserted TakeOrderedAndProject every pytest run AND the A/B
# control measured interleaved every bench dispute; join_broadcast:
# its broadcast plan shape is independently pinned every pytest run
# by test_join_broadcast_stays_broadcast). All four are re-verified
# by the local sf0.001 parity suite, the sf0.01 t2 sweep and the x10
# sweep this round. These MUST lead the r14 debt block — the guard
# test pins the overflow to exactly this list.
_DEBT_CARRY = ["set_union", "sort_multi", "topk", "join_broadcast"]


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
