"""Fixture/table catalog.

The reference reads its dimension/config relations from Oracle via
row-cursor JDBC (``MFramework.cpp:344-376``, ``:929-1022``); our data
path is columnar parquet scans with pushdown. ``load_table`` is the
single entry point so predicate pushdown / column pruning stay intact
(callers ``.select``/``.filter`` on the returned DataFrame and Catalyst
pushes it into the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Small dimensions that are always broadcast-join candidates at any
#: scale factor (bounded cardinality: 5 regions, 25 nations; suppliers
#: and parts grow with SF but stay dim-sized relative to the facts).
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (columnar parquet scan).

    ``events.ts`` must come out as session-tz TIMESTAMP whatever the
    parquet physical type is — the driver has shipped both
    TIMESTAMP(NANOS) (read as long nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``, converted here with
    integer division — a double-valued ``/1000`` would lose precision
    above 2^53 ns) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read
    as TIMESTAMP directly under
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false``; the NTZ→
    TIMESTAMP cast below is the belt-and-braces fallback if a caller
    session refuses that conf). Queries downstream may assume plain
    TIMESTAMP semantics (casts, unix_micros, range frames).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    from etl_work_flow_for_big_data_spark.session import tune_session

    # self-tune: reading TIMESTAMP(NANOS) parquet needs the legacy conf
    # even when the caller brought an untuned (driver-owned) session
    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count from the parquet footer — a metadata read, no
    scan job. Used to size driver-bounded operators (e.g.
    ``cosine_pairs`` block count) without paying a count() pass."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table; keys match the DuckDB oracle views."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so users can
    ``spark.sql`` against the catalog directly (the engine's full SQL
    surface; same names the DuckDB oracle uses)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
