"""``catalog.maybe_broadcast`` size gate.

A forced ``F.broadcast`` hint overrides autoBroadcastJoinThreshold
unconditionally — fine for bounded dims (region/nation), an OOM at the
100-TB design point for SF-growing ones (customer/supplier/part).
``maybe_broadcast`` stats the compressed parquet and withholds the hint
above BROADCAST_MAX_BYTES, handing the decision to AQE.
"""

from __future__ import annotations

import os

from etl_work_flow_for_big_data_spark.catalog import (
    BROADCAST_MAX_BYTES,
    load_table,
    maybe_broadcast,
)


def test_small_dim_gets_hint(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    hinted = maybe_broadcast(c, sf_dir, "customer")
    assert hinted is not c, "sf0.001 customer is tiny — hint expected"
    assert "UnresolvedHint broadcast" in hinted._jdf.queryExecution().logical().toString()


def test_fact_sized_dim_keeps_plain_plan(spark, sf_dir, tmp_path):
    # fake a fact-sized dim file: only the stat matters to the gate
    big = tmp_path / "customer.parquet"
    with open(big, "wb") as f:
        f.seek(BROADCAST_MAX_BYTES + 1)
        f.write(b"\0")
    assert os.path.getsize(big) > BROADCAST_MAX_BYTES
    c = load_table(spark, sf_dir, "customer")
    assert maybe_broadcast(c, str(tmp_path), "customer") is c


def test_missing_path_defers_to_aqe(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    assert maybe_broadcast(c, "/nonexistent/dir", "customer") is c
