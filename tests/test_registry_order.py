"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-5 must-check set: the queries whose implementation changed this
# round plus the 34 whose last hard check is round 3.
MUST_CHECK_R5 = [
    "dq_validate",
    "window_ntile",
    "dedup_ngram",
    "dedup_apply",
    "llm_clean_corpus",
    "dedup_components",
    "filter_required",
    "project_rename",
    "mm_decode",
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


def test_stale_and_changed_queries_lead_the_registry():
    names = list(load_all())
    first_50 = set(names[:50])
    missing = [n for n in MUST_CHECK_R5 if n not in first_50]
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
