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


# ---------------------------------------------------------------------------
# Physical-drift normalization: the canary above detects a regenerated
# fixture shifting types; these pin that load_table's events.ts
# normalization actually ABSORBS the three physical variants the driver
# has shipped (or could ship back) — micros-UTC, micros-NTZ, and
# NANOS — without waiting for the drift to happen live. Each variant is
# written via pyarrow (bypassing Spark's writer, like the driver does),
# then checked through to a window query's DuckDB oracle on that same
# file: normalization must preserve VALUES, not just the dtype.
# Values are micro-precision by fixture contract; the NANOS branch
# intentionally integer-divides sub-microsecond precision away.

import datetime as _dt
import os as _os

import duckdb as _duckdb
import pyarrow as _pa
import pyarrow.parquet as _pq


_DRIFT_TS = [
    _dt.datetime(2024, 1, 1, 0, 30, 1),
    _dt.datetime(2024, 1, 1, 1, 0, 59, 123456),
    _dt.datetime(1969, 12, 31, 23, 30, 1),  # negative epoch survives too
    None,
]


def _write_drifted_events(path: str, unit: str, tz: str | None) -> None:
    n = len(_DRIFT_TS)
    tbl = _pa.table(
        {
            "event_id": _pa.array(range(n), type=_pa.int64()),
            "ts": _pa.array(_DRIFT_TS, type=_pa.timestamp(unit, tz=tz)),
            "user_id": _pa.array([1, 1, 2, 2], type=_pa.int64()),
            "event_type": _pa.array(["a", "a", "b", "b"]),
            "value": _pa.array([1.0, 2.0, 3.0, 4.0], type=_pa.float64()),
            "props": _pa.array([None] * n, type=_pa.string()),
        }
    )
    _pq.write_table(tbl, path)


@pytest.mark.parametrize(
    "unit,tz",
    [("us", "UTC"), ("us", None), ("ns", None)],
    ids=["micros-utc", "micros-ntz", "nanos"],
)
def test_load_table_absorbs_timestamp_physical_drift(spark, tmp_path, unit, tz):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    f = _os.path.join(str(tmp_path), "events.parquet")
    _write_drifted_events(f, unit, tz)

    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp", (
        f"{unit}/{tz}: load_table must normalize to session-tz timestamp, "
        f"got {df.schema['ts'].dataType.simpleString()}"
    )

    con = _duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{f}')")
    spec = load_all()["window_tumbling"]
    compare(spec.fn(spark, str(tmp_path)), con.sql(spec.oracle))
    con.close()
