"""Brute-force property references for the event-time window family.

The window queries are verified against the DuckDB oracle (driver
gate, fuzz, adversarial corpus) — but both engines could share a
misreading of the SEMANTICS (e.g. both treating an exactly-30-minute
gap as a new session when the spec says in-session). These tests pit
``window_session`` / ``window_tumbling`` against a third,
independently-written reference: a plain-Python walk over the sorted
events, with the rules spelled out in one place.

Rules pinned here (probed on both engines before writing them down):
- session gap rule: an event STAYS in the session when its distance
  to the previous event is <= 30 minutes exactly; strictly greater
  starts a new session (both Spark's ``session_window`` merge --
  next.ts <= prev_end -- and the oracle's ``gap > INTERVAL 30
  MINUTE`` encode this);
- session_end = last event + gap (not last event);
- NULL timestamps belong to no window on either engine;
- values are generated as multiples of 0.25 so every partial sum is
  binary-exact and ROUND(x, 2) cannot sit on a half boundary —
  accumulation ORDER can never explain a mismatch away.
"""

from __future__ import annotations

import datetime as dt
import os
from collections import defaultdict

_BASE = dt.datetime(2024, 1, 1)
_GAP = dt.timedelta(minutes=30)
_FMT = "%Y-%m-%d %H:%M:%S"


def _mkrows(evs):
    """(user, minute, qv|None) triples → events-table rows; value is
    qv * 0.25 (binary-exact), minute None → NULL timestamp."""
    return [
        (
            i,
            None if m is None else _BASE + dt.timedelta(minutes=m),
            u,
            "t",
            None if qv is None else qv * 0.25,
            None,
        )
        for i, (u, m, qv) in enumerate(evs)
    ]


def _ref_sessions(evs):
    by_user = defaultdict(list)
    for u, m, qv in evs:
        if m is None:
            continue  # NULL ts: no window
        by_user[u].append((_BASE + dt.timedelta(minutes=m), qv))
    out = set()

    def emit(u, chunk):
        vals = [qv * 0.25 for _, qv in chunk if qv is not None]
        out.add(
            (
                u,
                min(t for t, _ in chunk).strftime(_FMT),
                (max(t for t, _ in chunk) + _GAP).strftime(_FMT),
                len(chunk),
                round(sum(vals), 2) if vals else None,
            )
        )

    for u, rows in by_user.items():
        rows.sort(key=lambda r: r[0])
        chunk = []
        for t, qv in rows:
            if chunk and (t - chunk[-1][0]) > _GAP:
                emit(u, chunk)
                chunk = []
            chunk.append((t, qv))
        if chunk:
            emit(u, chunk)
    return out


def _ref_tumbling(evs):
    by_bucket = defaultdict(list)
    for u, m, qv in evs:
        if m is None:
            continue
        t = _BASE + dt.timedelta(minutes=m)
        by_bucket[t.replace(minute=0, second=0, microsecond=0)].append(qv)
    out = set()
    for b, qvs in by_bucket.items():
        vals = [qv * 0.25 for qv in qvs if qv is not None]
        out.add(
            (
                b.strftime(_FMT),
                len(qvs),
                round(sum(vals), 2) if vals else None,
            )
        )
    return out


_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _run(spark, tmp, name, rows):
    from etl_work_flow_for_big_data_spark.queries import load_all

    spark.createDataFrame(rows, _EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "events.parquet"))
    return load_all()[name].fn(spark, tmp).collect()


def test_session_window_matches_bruteforce(spark, tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            # minute offsets dense enough that exact 30-minute gaps,
            # duplicate timestamps, and NULL ts all occur routinely
            st.one_of(st.none(), st.integers(min_value=0, max_value=240)),
            st.one_of(st.none(), st.integers(min_value=-40, max_value=40)),
        ),
        min_size=1,
        max_size=25,
    )
    tmp = str(tmp_path)

    @settings(max_examples=12, deadline=None)
    @given(events)
    def check(evs):
        got = {
            (
                r["user_id"],
                r["session_start"],
                r["session_end"],
                r["n_events"],
                r["total_value"],
            )
            for r in _run(spark, tmp, "window_session", _mkrows(evs))
        }
        assert got == _ref_sessions(evs), evs

    check()


def test_tumbling_window_matches_bruteforce(spark, tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.one_of(st.none(), st.integers(min_value=0, max_value=240)),
            st.one_of(st.none(), st.integers(min_value=-40, max_value=40)),
        ),
        min_size=1,
        max_size=25,
    )
    tmp = str(tmp_path)

    @settings(max_examples=10, deadline=None)
    @given(events)
    def check(evs):
        # every generated row has event_type 't', so the (hour, type)
        # grouping collapses to the per-hour reference
        got = {
            (r["window_start"], r["n_events"], r["total_value"])
            for r in _run(spark, tmp, "window_tumbling", _mkrows(evs))
        }
        assert got == _ref_tumbling(evs), evs

    check()


def _ref_sliding(evs):
    """2h-size / 1h-slide: each event belongs to exactly the two
    windows starting at trunc(hour) and trunc(hour) - 1h."""
    by_start = defaultdict(list)
    for u, m, qv in evs:
        if m is None:
            continue
        t = _BASE + dt.timedelta(minutes=m)
        h = t.replace(minute=0, second=0, microsecond=0)
        for start in (h, h - dt.timedelta(hours=1)):
            by_start[start].append(qv)
    out = set()
    for s, qvs in by_start.items():
        vals = [qv * 0.25 for qv in qvs if qv is not None]
        out.add(
            (
                s.strftime(_FMT),
                len(qvs),
                round(sum(vals), 2) if vals else None,
            )
        )
    return out


def test_sliding_window_matches_bruteforce(spark, tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.one_of(st.none(), st.integers(min_value=0, max_value=240)),
            st.one_of(st.none(), st.integers(min_value=-40, max_value=40)),
        ),
        min_size=1,
        max_size=25,
    )
    tmp = str(tmp_path)

    @settings(max_examples=10, deadline=None)
    @given(events)
    def check(evs):
        got = {
            (r["window_start"], r["n_events"], r["total_value"])
            for r in _run(spark, tmp, "window_sliding", _mkrows(evs))
        }
        assert got == _ref_sliding(evs), evs

    check()
