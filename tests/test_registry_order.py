"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-9 changed set: the seven queries whose rounded_sum/rounded_mean
# arithmetic (and DuckDB mirrors) became per-term integer-exact with
# decimal(38,0) accumulators this round, plus sim_pairs, whose
# _score_block kernel became two-phase (bit-identity pinned — but a
# changed engine gets a hard check, rule over trust). join_star /
# join_range / agg_rollup / agg_cube additionally clear the r8
# staleness defect: their engine or oracle changed AFTER the r8
# rotation froze, so their r8-era change has never been hard-checked.
CHANGED_R9 = [
    "rate_charge",
    "join_star",
    "join_range",
    "agg_groupby",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "sim_pairs",
    "dedup_embedding",  # NEW query this round
    "sample_quota",  # NEW query this round
    "text_repetition",  # NEW query this round
    # r9 ragged-probe fix: vector width joined the cosine domain on
    # both sides — the whole sim family changed engine AND oracle
    "sim_topk",
    "sim_ivf_topk",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "agg_rollup",
    "agg_cube",
]

# Round-9 rotation debt: round 8's driver check covered exactly the
# first 50 of the r8 ordering (CORRECTNESS_r08), so these queries'
# last hard driver check is round 7 — the contractual two-round edge.
# (The five r9-changed members of that same debt set — join_star,
# join_range, agg_groupby, agg_rollup, agg_cube — are listed above.)
STALE_R7 = [
    "join_broadcast",
    "join_anti",
    "join_left",
    "join_semi",
    "agg_distinct",
    "agg_conditional",
    "agg_stats",
    "window_rank",
    "topk",
    "sort_multi",
    "set_union",
    "agg_pivot",
    "agg_unpivot",
    "profile_columns",
    "dq_validate",
    "join_salted",
    "agg_grouping_sets",
    "text_tokens",
    "text_token_regex",
    "dedup_components",
    "text_scrub",
    "split_assign",
    "pack_sequences",
    "decontaminate",
    "mix_weighted",
    "route_assign",
    "ts_gapfill",
]


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    must_check = CHANGED_R9 + STALE_R7
    missing = [n for n in must_check if n not in first_50]
    assert not missing, f"must-check queries outside the driver window: {missing}"


def test_registry_order_follows_check_priority():
    names = list(load_all())
    listed = [n for n in names if n in set(_CHECK_PRIORITY)]
    expected = [n for n in _CHECK_PRIORITY if n in set(names)]
    assert listed == expected


def test_priority_names_all_registered():
    names = set(load_all())
    unknown = [n for n in _CHECK_PRIORITY if n not in names]
    assert not unknown, f"_CHECK_PRIORITY references unregistered queries: {unknown}"


def test_every_query_has_callable_and_registry_is_complete():
    reg = load_all()
    assert len(reg) >= 83
    for spec in reg.values():
        assert callable(spec.fn)
