"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-11 changed set: ivf_topk was refactored onto the shared
# _ivf_scored_assign helper (plan unchanged, but changed engine → hard
# check, rule over trust); sim_ivf_persisted is NEW — the
# build-once/query-many inverted file (ivf_build + ivf_query), pinned
# against the same oracle as the one-shot.
CHANGED_R11 = [
    "sim_ivf_persisted",  # NEW query this round
    "sim_ivf_persisted_nprobe",  # NEW query this round
    "sim_topk_quantized",  # NEW query this round
    "sim_ivf_topk",
    "sim_ivf_nprobe",
]

# Round-11 rotation debt: queries whose last hard driver check was
# round 9 (CORRECTNESS_r09 minus CORRECTNESS_r10 — exactly the 40 the
# r10 rotation comment predicted, and the 40 VERDICT r10 next-round #1
# prescribes).
STALE_R9 = [
    "agg_groupby",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_conditional",
    "agg_stats",
    "agg_pivot",
    "agg_unpivot",
    "join_broadcast",
    "join_anti",
    "join_left",
    "join_semi",
    "join_star",
    "join_range",
    "join_salted",
    "window_rank",
    "topk",
    "sort_multi",
    "set_union",
    "sim_topk",
    "sim_pairs",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "dedup_embedding",
    "decontaminate",
    "text_tokens",
    "text_token_regex",
    "text_scrub",
    "text_repetition",
    "sample_quota",
    "split_assign",
    "mix_weighted",
    "route_assign",
    "ts_gapfill",
    "dq_validate",
    "profile_columns",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
]


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    must_check = CHANGED_R11 + STALE_R9
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
