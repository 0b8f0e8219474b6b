"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: any query that
has never received a hard driver check must appear within the first 50
slots of ``load_all()``. See queries/__init__.py ``_CHECK_PRIORITY``.
"""

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Never driver-checked through round 2 (VERDICT r2, "What's missing" #1).
NEVER_CHECKED = [
    "dedup_exact",
    "dedup_ngram",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_apply",
    "dedup_components",
    "decontaminate",
    "llm_clean_corpus",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "ts_gapfill",
    "route_assign",
    "text_fingerprint",
    "text_token_regex",
    "text_chunk",
    "text_scrub",
    "text_editdist",
    "split_assign",
    "pack_sequences",
    "mix_weighted",
    "sim_ann_multiprobe",
    "join_salted",
    "window_ntile",
    "agg_grouping_sets",
    "window_range_frame",
]


def test_never_checked_queries_lead_the_registry():
    names = list(load_all())
    first_50 = set(names[:50])
    missing = [n for n in NEVER_CHECKED if n not in first_50]
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
