"""Registry iteration-order contract.

The driver's per-round CORRECTNESS run caps at 50 queries in
registry-iteration order, so ordering is load-bearing: the round's
red/changed queries plus the stalest-checked set must appear within the
first 50 slots of ``load_all()``. See queries/__init__.py
``_CHECK_PRIORITY``.
"""

import glob
import json
import os
import re

from etl_work_flow_for_big_data_spark.queries import _CHECK_PRIORITY, load_all

# Round-12 changed set (manual — matches the closing audit in
# queries/__init__.py): sim_ivf_trained is NEW (trained-centroid
# persisted IVF served at probe-ALL); quantize_embedding gained the
# totality guard (sim_topk_quantized consumes it); ivf_query's
# owns-itself override now keys on centroid membership and the
# persisted-index cache keys on a table fingerprint
# (sim_ivf_persisted[_nprobe] consume both).
CHANGED_THIS_ROUND = [
    "sim_ivf_trained",  # NEW query this round
    "sim_topk_quantized",
    "sim_ivf_persisted",
    "sim_ivf_persisted_nprobe",
    "dedup_minhash",  # merge-hinted corpus joins (the sf1 OOM fix)
    "subquery_exists",  # explicit decorrelated semi-join + merge hint
    "subquery_scalar",  # explicit decorrelated aggregate + merge hint
    "tpch_q18_large_orders",  # merge-hinted corpus-scaled build side
]


def _stale_keys() -> list[str]:
    """Rotation debt derived from the committed driver records, not a
    hand-maintained list (r12): queries hard-checked in round N-1 but
    not round N are exactly the ≤1-round-staleness debt the next
    driver run must clear. Deriving it here means the test cannot
    drift from the actual CORRECTNESS history the judge audits."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if len(recs) < 2:
        return []
    with open(recs[-1]) as f:
        latest = set(json.load(f))
    with open(recs[-2]) as f:
        prev = set(json.load(f))
    return sorted(prev - latest)


def test_changed_queries_all_inside_the_50_slot_window():
    names = list(load_all())
    first_50 = set(names[:50])
    must_check = CHANGED_THIS_ROUND + _stale_keys()
    missing = [n for n in must_check if n not in first_50]
    assert not missing, f"must-check queries outside the driver window: {missing}"


def test_changed_queries_lead_the_priority_list():
    """NEW/CHANGED queries must occupy the FRONT slots (the process
    rule): a changed query behind the rotation debt could fall out of
    the 50-slot window when the debt grows."""
    head = _CHECK_PRIORITY[: len(CHANGED_THIS_ROUND)]
    assert sorted(head) == sorted(CHANGED_THIS_ROUND), head


def test_registry_order_follows_check_priority():
    names = list(load_all())
    listed = [n for n in names if n in set(_CHECK_PRIORITY)]
    expected = [n for n in _CHECK_PRIORITY if n in set(names)]
    assert listed == expected


def test_priority_names_all_registered():
    names = set(load_all())
    unknown = [n for n in _CHECK_PRIORITY if n not in names]
    assert not unknown, f"_CHECK_PRIORITY references unregistered queries: {unknown}"


def test_priority_fits_driver_window():
    assert len(_CHECK_PRIORITY) <= 50, len(_CHECK_PRIORITY)


def test_every_query_has_callable_and_registry_is_complete():
    reg = load_all()
    assert len(reg) >= 83
    for spec in reg.values():
        assert callable(spec.fn)
