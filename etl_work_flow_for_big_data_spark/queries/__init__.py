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
# ROUND-14 ROTATION (VERDICT r13 #4 + closing audit): the round diff
# touches engine/oracle surfaces via (a) corpus-scaled n_planes in the
# registered ANN-dedup queries (dedup_embedding_ann[_h1]: n_planes =
# clamp(bit_length(footer_rows // 4), 8, 24), oracle mirrored by the
# _DUCK_NP params CTE; plus the ADVICE r13 fan-out-aware broadcast
# pricing in ann_near_dup_pairs) — both move to FRONT slots; (b)
# route_assign's per-route row_number funnel replaced by a
# deterministic md5-prefix hash slot (VERDICT r13 #3) — engine AND
# oracle changed, FRONT slot. dedup_minhash/dedup_ngram were
# re-MEASURED this round (BENCH_AB.json, docs/minhash_regime_ab_r14.
# json) but their code paths are untouched and both are r13/r12
# hash-green — measurement is not change. Then the FOUR r11 carries
# VERDICT r13 #4 orders to lead the debt block (their last hard check
# is r11 — invisible to the r12/r13 basis-derived debt, hence named
# explicitly), then the 43-name rotation debt (CORRECTNESS_r12 minus
# CORRECTNESS_r13, pinned by _PRIORITY_BASIS). 3 changed + 4 carries
# + 43 debt = exactly 50: every name fits the driver window and
# _DEBT_CARRY goes EMPTY — no query's last hard check will be older
# than 2 rounds after the r14 run.
_CHECK_PRIORITY = [
    # -- engine/oracle changed in round 14 (see closing audit above)
    "dedup_embedding_ann",  # corpus-scaled n_planes + gate fan pricing
    "dedup_embedding_ann_h1",  # same, multi-probe lever
    "route_assign",  # row_number funnel -> md5 hash slot
    # -- r11 carries (VERDICT r13 #4: MUST lead the r14 debt block)
    "set_union",
    "sort_multi",
    "topk",
    "join_broadcast",
    # -- rotation debt: last hard driver check round 12
    "agg_approx_distinct",
    "agg_approx_quantile",
    "case_map",
    "cast_types",
    "dedup_apply",
    "dedup_components",
    "dedup_exact",
    "dedup_ngram",
    "dedup_passages",
    "dedup_simhash",
    "filter_bitmask",
    "filter_required",
    "join_asof",
    "llm_clean_corpus",
    "merge_upsert",
    "mm_binary_meta",
    "mm_features",
    "mm_frames",
    "null_handling",
    "pack_sequences",
    "pack_sequences_bucketed",
    "parse_json",
    "parse_kv",
    "project_rename",
    "rate_charge",
    "scalar_string_date",
    "serialize_json",
    "serialize_kv",
    "sim_topk_quantized",
    "text_chunk",
    "text_editdist",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "tpch_q12_priority_by_tier",
    "tpch_q14_promo_share",
    "tpch_q22_idle_customers",
    "window_analytic",
    "window_ntile",
    "window_range_frame",
    "window_session",
    "window_sliding",
    "window_tumbling",
]

# The CORRECTNESS record pair (round numbers) the rotation-debt block
# above was derived from: debt == set(CORRECTNESS_r{lo}) -
# set(CORRECTNESS_r{hi}). tests/test_registry_order.py keys its
# derivation to THIS pair — not "the two newest records on disk" — so
# the driver committing the next round's snapshot cannot invalidate a
# priority list that was correct when written (ADVICE r12 #1). Bump
# alongside every _CHECK_PRIORITY rewrite at round open.
_PRIORITY_BASIS = (12, 13)

# r14: changed (3) + r11 carries (4) + basis debt (43) = exactly 50 —
# nothing overflows the driver window, so no carry-over this round.
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
