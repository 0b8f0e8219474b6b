"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Every query whose implementation or oracle changed in round 7, plus
# the round's rotation debt — these MUST receive a fresh driver hash
# check, ahead of recently-checked unchanged queries. The stale sets
# are the queries whose last hard driver check was round 4 (deferred
# by the r5 AND r6 rotations — the contractual limit) or round 5 (the
# two-round edge; deferring any would overflow round 8's 50-slot
# quota, which already owes the 34 r6-checked queries).
CHANGED_R7 = [
    "parse_json",
    "rate_charge",
    "agg_groupby",
    "dedup_components",
]
STALE_R4 = [
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
STALE_R5 = [
    "agg_grouping_sets",
    "case_map",
    "cast_types",
    "decontaminate",
    "dq_validate",
    "filter_bitmask",
    "join_broadcast",
    "join_salted",
    "mix_weighted",
    "mm_binary_meta",
    "mm_decode",
    "pack_sequences",
    "route_assign",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "split_assign",
    "text_scrub",
    "text_token_regex",
    "text_tokens",
    "ts_gapfill",
]


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    must_check = CHANGED_R7 + STALE_R4 + STALE_R5
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
