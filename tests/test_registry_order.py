"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Every query whose implementation or oracle changed in round 6 — these
# MUST receive a fresh driver hash check, ahead of stale-but-unchanged
# queries (r6 had 32 touched + 32 still-stale = 64 candidates for 50
# slots (agg_groupby moved from the stale set into touched); the
# 14-query overflow is the deliberate deferred tail
# documented in _CHECK_PRIORITY).
CHANGED_R6 = [
    "dedup_minhash",
    "text_quality",
    "text_lang_id",
    "dedup_ngram",
    "dedup_apply",
    "llm_clean_corpus",
    "dedup_simhash",
    "text_chunk",
    "filter_required",
    "project_rename",
    "sim_pairs",
    "sim_topk",
    "sim_ivf_topk",
    "dedup_components",
    "window_ntile",
    "scalar_string_date",
    "agg_approx_quantile",
    "mm_features",
    "mm_frames",
    "mm_resize",
    "parse_kv",
    "serialize_kv",
    "serialize_json",
    "parse_json",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "text_editdist",
    "text_fingerprint",
    "dedup_exact",
    "rate_charge",
    "agg_groupby",
    "window_analytic",
]


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    missing = [n for n in CHANGED_R6 if n not in first_50]
    assert not missing, f"changed queries outside the driver window: {missing}"


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
