"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-6 must-check set: the queries whose implementation changed this
# round plus the 34 whose last hard check is round 4.
MUST_CHECK_R6 = [
    "filter_required",
    "project_rename",
    "sim_pairs",
    "dedup_components",
    "window_ntile",
    "join_anti",
    "join_asof",
    "join_left",
    "join_range",
    "join_semi",
    "join_star",
    "merge_upsert",
    "agg_groupby",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_approx_quantile",
    "agg_conditional",
    "agg_cube",
    "agg_rollup",
    "agg_pivot",
    "agg_unpivot",
    "agg_stats",
    "null_handling",
    "profile_columns",
    "set_union",
    "sort_multi",
    "subquery_exists",
    "subquery_scalar",
    "topk",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_tier",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q22_idle_customers",
    "window_analytic",
    "window_range_frame",
    "window_rank",
]


def test_stale_and_changed_queries_lead_the_registry():
    names = list(load_all())
    first_50 = set(names[:50])
    missing = [n for n in MUST_CHECK_R6 if n not in first_50]
    assert not missing, f"queries outside the driver's 50-slot window: {missing}"


def test_priority_names_all_registered():
    names = set(load_all())
    unknown = [n for n in _CHECK_PRIORITY if n not in names]
    assert not unknown, f"_CHECK_PRIORITY references unregistered queries: {unknown}"


def test_every_query_has_callable_and_registry_is_complete():
    reg = load_all()
    assert len(reg) >= 83
    for spec in reg.values():
        assert callable(spec.fn)
