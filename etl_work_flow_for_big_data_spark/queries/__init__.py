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
# ROUND-15 ROTATION (VERDICT r14 next-round #1 + closing audit): the
# r14 optimization commits rewrote the engine side of the whole
# sim_ivf_* family — argmax assignment (c9bc859), one-shot corpus pass
# (649e928), sidecar cache (97b8c57) — but none of the five registered
# queries got a driver hash check in r14 (all were outside the
# 50-sample; the broken closing-audit rule is VERDICT r14 "What's
# wrong" #1). They lead this round's list so the rewrites receive
# their first ground-truth driver check. Then the full rotation debt:
# every query hard-checked in r13 but not r14 (CORRECTNESS_r13 minus
# CORRECTNESS_r14, pinned by _PRIORITY_BASIS) — the five leads are
# themselves debt members, so 5 changed + 42 remaining debt = 47 ≤ 50,
# _DEBT_CARRY EMPTY, and 3 slots remain for queries this optimization
# round changes (re-audited against `git diff` at round close per the
# r8 process rule).
_CHECK_PRIORITY = [
    # -- engine changed in round 14, never driver-checked (VERDICT r14 #1)
    "sim_ivf_topk",  # one-shot corpus pass + argmax assignment
    "sim_ivf_nprobe",  # query-rows probe ranking + argmax
    "sim_ivf_persisted",  # sidecar cache + argmax
    "sim_ivf_persisted_nprobe",  # sidecar cache + argmax
    "sim_ivf_trained",  # sidecar cache + argmax (kmeans_refine)
    # -- r15 optimization targets (VERDICT r14 #6/#7); slotted at round
    #    open so an engine change to them is driver-checked even if the
    #    closing audit is interrupted. Re-audited at round close.
    "window_ntile",  # distributed_ntile pass structure
    "dedup_apply",  # connected_components round machinery
    "dedup_components",  # same operator, registered directly
    # -- rotation debt: last hard driver check round 13
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
    "dedup_minhash",
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
    "sample_quota",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "sim_pairs",
    "sim_topk",
    "split_assign",
    "subquery_exists",
    "subquery_scalar",
    "text_repetition",
    "text_scrub",
    "text_token_regex",
    "text_tokens",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
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
# priority list that was correct when written (ADVICE r12 #1). Bump
# alongside every _CHECK_PRIORITY rewrite at round open.
_PRIORITY_BASIS = (13, 14)

# r15: changed (5, all debt members) + r15-touched (3, r14-checked) +
# remaining basis debt (42) = exactly 50 — nothing overflows the
# driver window, so no carry-over this round.
_DEBT_CARRY: list[str] = []


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
