"""Source/format registry — the ProtocolFactory analog.

The reference registers protocol plugins by name (ftp/sftp/ftps/local)
and resolves them at use time
(``/root/reference/ProtocolFactory.cpp:78-118``, registration at
``MFramework.cpp:152-155``). Here the registry keys are data formats
(batch + streaming readers over a landing zone) plus fetch protocols
for moving remote files INTO the landing zone; on a cluster the
landing zone is an object store and fetch becomes a no-op mount.

Batch formats: parquet, csv, json, text, kv_text (wire packets),
jdbc (gated on a driver being installed).
Streaming formats: parquet, csv, json, text, kv_text via
``read_stream`` (file-stream sources; Kafka slots in by registering
"kafka" where the connector jar exists).
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SourceRegistry:
    def __init__(self) -> None:
        self._batch: dict[str, Callable[..., DataFrame]] = {}
        self._stream: dict[str, Callable[..., DataFrame]] = {}
        self._fetch: dict[str, Callable[..., str]] = {}

    # -- format readers ------------------------------------------------
    def register(self, fmt: str, fn: Callable[..., DataFrame], streaming: bool = False):
        (self._stream if streaming else self._batch)[fmt] = fn

    def read(self, spark: SparkSession, fmt: str, path: str, **opts: Any) -> DataFrame:
        try:
            fn = self._batch[fmt]
        except KeyError:
            raise KeyError(
                f"unknown source format {fmt!r}; registered: {sorted(self._batch)}"
            ) from None
        return fn(spark, path, **opts)

    def read_stream(
        self, spark: SparkSession, fmt: str, path: str, schema: StructType | str, **opts: Any
    ) -> DataFrame:
        try:
            fn = self._stream[fmt]
        except KeyError:
            raise KeyError(
                f"unknown streaming format {fmt!r}; registered: {sorted(self._stream)}"
            ) from None
        return fn(spark, path, schema, **opts)

    # -- fetch protocols (ProtocolFactory analog) -----------------------
    def register_protocol(self, proto: str, fn: Callable[..., str]):
        """MFramework.cpp:152-155 registers ftp/sftp/ftps/local."""
        self._fetch[proto] = fn

    def fetch(self, proto: str, src: str, dst: str, **opts: Any) -> str:
        try:
            fn = self._fetch[proto]
        except KeyError:
            raise KeyError(
                f"unknown protocol {proto!r}; registered: {sorted(self._fetch)}"
            ) from None
        return fn(src, dst, **opts)

    def protocols(self) -> list[str]:
        return sorted(self._fetch)


DEFAULT = SourceRegistry()


def _reader(fmt: str):
    def fn(spark: SparkSession, path: str, **opts: Any) -> DataFrame:
        return spark.read.options(**opts).format(fmt).load(path)

    return fn


def _stream_reader(fmt: str):
    def fn(spark: SparkSession, path: str, schema, **opts: Any) -> DataFrame:
        reader = spark.readStream.options(**opts).format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)

    return fn


for _fmt in ("parquet", "csv", "json", "text"):
    DEFAULT.register(_fmt, _reader(_fmt))
    DEFAULT.register(_fmt, _stream_reader(_fmt), streaming=True)


def _read_kv_text(spark: SparkSession, path: str, **opts: Any) -> DataFrame:
    """Wire-packet files: one packet per line (entries separated by the
    substitute char ``sep`` since raw packets are multi-line), parsed
    to attrs + promoted keys via the parse_packets operator."""
    sep = opts.pop("sep", "|")
    from etl_work_flow_for_big_data_spark.operators.transforms import parse_packets

    raw = spark.read.options(**opts).text(path)
    df = raw.select(_line_payload(sep))
    return parse_packets(df)


def _line_payload(sep: str):
    """One packet per file line: the line terminator the text reader
    stripped WAS the final entry's terminator, so restore it — the
    parser (packet_entries) consumes only terminated entries, exactly
    like the reference's find-loop (MFramework.cpp:1234-1243)."""
    return F.concat(F.translate("value", sep, "\n"), F.lit("\n")).alias("payload")


def _read_kv_text_stream(spark: SparkSession, path: str, schema, **opts: Any) -> DataFrame:
    sep = opts.pop("sep", "|")
    from etl_work_flow_for_big_data_spark.operators.transforms import parse_packets

    raw = spark.readStream.options(**opts).text(path)
    df = raw.select(_line_payload(sep))
    return parse_packets(df)


DEFAULT.register("kv_text", _read_kv_text)
DEFAULT.register("kv_text", _read_kv_text_stream, streaming=True)


def _read_jdbc(spark: SparkSession, path: str, **opts: Any) -> DataFrame:
    """A4: relational scan (the reference's Oracle config/dim reads,
    MFramework.cpp:344-376). ``path`` is the JDBC URL; pass
    ``dbtable``/``query`` + credentials as options. Requires the JDBC
    driver jar on the classpath — raises a clear error otherwise."""
    try:
        return spark.read.format("jdbc").option("url", path).options(**opts).load()
    except Exception as exc:  # driver missing / bad URL — explain
        raise RuntimeError(
            "jdbc source needs a JDBC driver jar on the Spark classpath "
            "(spark.jars) and url/dbtable options; underlying error: "
            f"{exc}"
        ) from exc


DEFAULT.register("jdbc", _read_jdbc)


def write_kv_text(df: DataFrame, path: str, attrs_col: str = "attrs", sep: str = "|") -> None:
    """A2 queue-sink analog: serialize packet maps back to the wire
    format (key-sorted ``k=v`` entries, LoggerWriter/AMQPProducer shape,
    MFramework.cpp:1552-1560) and write one packet per line, entry
    separator substituted with ``sep``."""
    from etl_work_flow_for_big_data_spark.functions.packets import serialize_map

    wire = serialize_map(F.col(attrs_col))
    # the separator must not occur inside any value — after translate()
    # it would be indistinguishable from an entry boundary and the
    # round-trip would silently split the value. Fail loudly, IN-ROW,
    # inside the same write pass (a filter+count pre-scan would double
    # the full scan at 100 TB just for a sanity check).
    guarded = F.when(
        F.instr(wire, sep) > 0,
        F.raise_error(
            F.concat(
                F.lit(
                    f"separator {sep!r} occurs inside a packet value; "
                    "pick a sep absent from the data "
                    "(write_kv_text(..., sep=...)); offending packet: "
                ),
                wire,
            )
        ).cast("string"),
    ).otherwise(F.translate(wire, "\n", sep))
    out = df.select(guarded.alias("value"))
    out.write.mode("overwrite").text(path)


# -- fetch protocols -----------------------------------------------------


def _fetch_local(src: str, dst: str, **_: Any) -> str:
    """'local' protocol: copy into the landing zone
    (ProtocolFactory's LOCAL plugin analog)."""
    return shutil.copy(src, dst)


def _fetch_unimplemented(proto: str):
    def fn(src: str, dst: str, **_: Any) -> str:
        raise NotImplementedError(
            f"{proto} fetch requires a network client (paramiko/ftplib "
            "wiring) not bundled in this environment; register a real "
            f"implementation via DEFAULT.register_protocol({proto!r}, fn). "
            "On a cluster, prefer mounting the remote store instead."
        )

    return fn


DEFAULT.register_protocol("local", _fetch_local)
for _proto in ("ftp", "sftp", "ftps"):
    DEFAULT.register_protocol(_proto, _fetch_unimplemented(_proto))
