"""Built-in named operators — the standard plugin set.

These are the session-plugin analogs a pipeline spec references by
name (the reference loads them from .so files by name,
``MFramework.cpp:970``, ``:744-749``). Each is a pure DataFrame
transform registered in the default registry; pipelines chain them via
plans/spec.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.functions.packets import (
    packet_get,
    packet_map,
    serialize_map,
)
from etl_work_flow_for_big_data_spark.operators.registry import operator


@operator("identity")
def identity(df: DataFrame) -> DataFrame:
    return df


@operator("parse_packets")
def parse_packets(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """B1: wire text → attrs map + promoted well-known keys
    (s/f/t/a, the reference's reserved keys)."""
    m = packet_map(F.col(payload_col))
    return (
        df.withColumn("attrs", m)
        .withColumn("s", packet_get(F.col("attrs"), "s").cast("long"))
        .withColumn("f", packet_get(F.col("attrs"), "f"))
        .withColumn("t", packet_get(F.col("attrs"), "t"))
        .withColumn("a", packet_get(F.col("attrs"), "a"))
    )


@operator("filter_valid")
def filter_valid(df: DataFrame, required: str = "s") -> DataFrame:
    """B3: drop packets lacking the required key
    (MFramework.cpp:1245-1250)."""
    return df.filter(F.col(required).isNotNull())


@operator("serialize_packets")
def serialize_packets(df: DataFrame, attrs_col: str = "attrs") -> DataFrame:
    """B2: attrs map → wire text column ``payload``."""
    return df.withColumn("payload", serialize_map(F.col(attrs_col)))


@operator("project")
def project(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    return df.select(*(columns or df.columns))


@operator("filter_expr")
def filter_expr(df: DataFrame, predicate: str = "true") -> DataFrame:
    return df.filter(F.expr(predicate))


@operator("with_column")
def with_column(df: DataFrame, name: str = "col", expr: str = "NULL") -> DataFrame:
    return df.withColumn(name, F.expr(expr))


@operator("rate")
def rate(
    df: DataFrame,
    amount: str = "l_extendedprice",
    discount: str = "l_discount",
    tax: str = "l_tax",
    out: str = "charge",
) -> DataFrame:
    """B9: the rating arithmetic the reference's gsmrating binary
    performs per CDR (gsmrating.sh:14 domain)."""
    return df.withColumn(
        out,
        F.round(F.col(amount) * (1 - F.col(discount)) * (1 + F.col(tax)), 2),
    )


@operator("route_by")
def route_by(df: DataFrame, key: str = "t", out: str = "route") -> DataFrame:
    """F1: stamp the content-based route (the writer-demux 't' key,
    MFramework.cpp:1372-1377). Physical fan-out happens at the sink
    (partitionBy(route))."""
    return df.withColumn(out, F.coalesce(F.col(key), F.lit("dead-letter")))


@operator("repartition_by_key")
def repartition_by_key(df: DataFrame, key: str = "s", n: int | None = None) -> DataFrame:
    """F2: hash distribution by session key (per-session dispatch,
    MFramework.cpp:1276-1306)."""
    return df.repartition(n, F.col(key)) if n else df.repartition(F.col(key))


@operator("round_robin")
def round_robin(df: DataFrame, n: int = 4) -> DataFrame:
    """F3: round-robin redistribution (producer index cycling,
    MFramework.cpp:1565-1571) — Spark's RoundRobinPartitioning."""
    return df.repartition(n)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Batch CDC merge: rows of ``updates`` replace same-key rows of
    ``base``; new keys append; rows with ``tombstone_col`` true are
    deleted. The plain-parquet answer to MERGE INTO (no lakehouse
    dependency): survivors = base ANTI-JOIN update-keys, result =
    survivors UNION updates-minus-tombstones.

    At 100 TB: one shuffle on the merge key for the anti-join (or zero
    with pre-bucketed layouts, operators/distribution.py) and a
    narrow union — update batches are typically ≪ base, so the
    anti-join broadcasts the update-key side. Output overwrites the
    base atomically at the sink (write-then-swap), exactly how the
    reference's batch jobs replace their landing outputs.
    """
    upd_keys = updates.select(*key_cols).distinct()
    survivors = base.join(upd_keys, key_cols, "left_anti")
    live = (
        updates.filter(~F.coalesce(F.col(tombstone_col), F.lit(False)))
        .drop(tombstone_col)
        if tombstone_col
        else updates
    )
    return survivors.unionByName(live)

