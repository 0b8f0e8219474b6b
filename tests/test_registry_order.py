"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-8 rotation debt: round 7's driver check covered exactly the
# first 50 of the r7 ordering (judge-verified), so these 34 queries'
# last hard driver check is round 6 — the contractual two-round edge.
# All of them MUST land inside round 8's 50-slot window. Round 8
# changes no query implementation (its work is tests + harness), so
# there is no changed-set; the 16 remaining slots back-fill from the
# r7-checked set in registration order, leaving 34 r7-checked queries
# as round 9's debt (again exactly 34 + 16 = 50).
STALE_R6 = [
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
CHANGED_R8: list[str] = []  # no query implementation touched in round 8


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    must_check = CHANGED_R8 + STALE_R6
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
