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
# which queries receive a hard oracle check. Round-5 rotation
# (VERDICT r4 "Next round" #3): queries whose implementation changed
# this round lead (they need a fresh hash check), then the 34 queries
# whose last hard check is round 3 (text/dedup/sim/streaming-window
# families), so no query's latest check is ever older than two rounds.
# Names absent from this list (the r4-green, untouched set) keep
# registration order at the back; NEW/CHANGED queries must be added to
# the front to receive a slot.
_CHECK_PRIORITY = [
    # -- implementation touched in round 5 (dq_validate went lazy;
    #    window_ntile auto now always split_points on numeric keys;
    #    the dedup family's bounded-Jaccard docstring change is
    #    code-neutral but they also sit in the stale-r3 set)
    "dq_validate",
    "window_ntile",
    "dedup_ngram",
    "dedup_apply",
    "llm_clean_corpus",
    "dedup_components",
    "filter_required",
    "project_rename",
    "mm_decode",
    # -- last hard check is round 3 (r4 spent its 50 slots on the
    #    then-stale r2 set)
    "rate_charge",
    "join_broadcast",
    "join_salted",
    "agg_grouping_sets",
    "sim_topk",
    "sim_pairs",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_ann_multiprobe",
    "text_tokens",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_token_regex",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "text_chunk",
    "text_scrub",
    "split_assign",
    "pack_sequences",
    "text_editdist",
    "decontaminate",
    "mix_weighted",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "route_assign",
    "ts_gapfill",
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
