"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-10 changed set: pack_sequences' engine was refactored onto the
# shared operators.transforms.pack_sequences window builder (plan
# unchanged, but changed engine → hard check, rule over trust);
# pack_sequences_bucketed is NEW — the coded per-lang serial-funnel
# remedy (window key subdivided by a deterministic doc_id hash
# bucket).
CHANGED_R10 = [
    "pack_sequences",
    "pack_sequences_bucketed",  # NEW query this round
    # ivf_topk grew the nprobe recall lever; the registered query runs
    # the unchanged nprobe=1 branch, but the rule is the rule
    "sim_ivf_topk",
    "sim_ivf_nprobe",  # NEW query this round
    # connected_components gained the stats rounds-counter out-param
    # (semantics unchanged; instrumentation only — rule over trust)
    "dedup_components",
    "dedup_passages",  # NEW query this round
    # oracle changed in r10 (drift-wave tie-consistency fix); also in
    # STALE_R8 below — listed once there, named here for the audit
    "window_session",
]

# Round-10 rotation debt: queries whose last hard driver check was
# round 8 (CORRECTNESS_r08 minus CORRECTNESS_r09 — exactly the 37 the
# r9 rotation comment predicted).
STALE_R8 = [
    "parse_json",
    "serialize_json",
    "serialize_kv",
    "filter_required",
    "filter_bitmask",
    "project_rename",
    "cast_types",
    "case_map",
    "scalar_string_date",
    "null_handling",
    "join_asof",
    "merge_upsert",
    "subquery_exists",
    "subquery_scalar",
    "agg_approx_distinct",
    "agg_approx_quantile",
    "window_analytic",
    "window_ntile",
    "window_range_frame",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "tpch_q12_priority_by_tier",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q22_idle_customers",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram",
    "dedup_simhash",
    "dedup_apply",
    "llm_clean_corpus",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_chunk",
    "text_editdist",
]


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    must_check = CHANGED_R10 + STALE_R8
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
