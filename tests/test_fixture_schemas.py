"""Fixture-schema canary.

The driver regenerates /root/testdata between rounds and has already
changed physical types once (events.ts went TIMESTAMP(NANOS) →
TIMESTAMP(MICROS, isAdjustedToUTC=false), which turned a legal
LTZ→double cast into an illegal NTZ one and silently broke a query plus
the whole bench run). This test pins the *logical* dtypes every query
in the registry assumes, as seen through ``catalog.load_table`` — if a
fixture regeneration shifts a type again, THIS fails with an obvious
message instead of an arbitrary query deep in the registry.
"""

from __future__ import annotations

import pytest

from etl_work_flow_for_big_data_spark.catalog import TABLES, load_table

#: column → expected Spark simpleString dtype, per table. Only the
#: columns whose types queries actually lean on (joins, casts, range
#: frames, vector kernels) — not an exhaustive schema freeze.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_size": "int", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        # MUST be session-tz timestamp (not timestamp_ntz): range-frame
        # and windowing queries cast/epoch it, and NTZ forbids those.
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("table", TABLES)
def test_fixture_dtypes(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = EXPECTED[table]
    missing = set(expected) - set(actual)
    assert not missing, (
        f"{table}: driver fixture lost columns {sorted(missing)} "
        f"(has {sorted(actual)})"
    )
    wrong = {
        c: (want, actual[c]) for c, want in expected.items() if actual[c] != want
    }
    assert not wrong, (
        f"{table}: fixture dtype drift (col: expected→actual): {wrong}. "
        "The driver regenerated the parquet with different physical "
        "types — fix catalog.load_table normalization, not the queries."
    )
