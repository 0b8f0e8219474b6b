"""G8 stateful per-key processing (state survives restart via
checkpoint), A7 log sink admission + packet shape, A2 kv_text
write/read round trip."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.sources.registry import DEFAULT as SOURCES
from etl_work_flow_for_big_data_spark.sources.registry import write_kv_text
from etl_work_flow_for_big_data_spark.streaming.logsink import (
    build_log_packets,
    log_table_writer,
)
from etl_work_flow_for_big_data_spark.streaming.stateful import (
    running_totals_per_key,
    tws_available,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_chunk(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"chunk_{time.time_ns()}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.parametrize(
    "engine",
    [
        pytest.param(
            "tws",
            marks=pytest.mark.skipif(
                not tws_available(),
                reason="transformWithStateInPandas needs the protobuf "
                "package for its Python state server (absent in this "
                "runtime; capability-gated, see COVERAGE.md)",
            ),
        ),
        "applyinpandas",
    ],
)
def test_stateful_running_totals_survive_restart(spark, tmp_path, engine):
    """Per-key state (the session-plugin state analog,
    MFramework.cpp:749-773) persists across query RESTARTS through the
    checkpoint — the FWorkCheckpoint recovery semantics. Pinned on
    BOTH engines: transformWithStateInPandas (the Spark 4 default,
    RocksDB-backed state) and the legacy applyInPandasWithState
    fallback — their checkpoints are not interchangeable, so each
    restart here stays within its own engine."""
    indir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    _write_chunk(
        indir,
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:01", "user_id": 1, "event_type": "a", "value": 10.0},
            {"event_id": 2, "ts": "2024-01-01 00:00:02", "user_id": 1, "event_type": "a", "value": 5.0},
            {"event_id": 3, "ts": "2024-01-01 00:00:03", "user_id": 2, "event_type": "a", "value": 1.0},
        ],
    )

    outdir = tmp_path / "out"

    def run(run_id):
        stream = SOURCES.read_stream(spark, "json", str(indir), EVENTS_SCHEMA)

        def write(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                str(outdir / f"run={run_id}" / f"batch={batch_id}")
            )

        q = (
            running_totals_per_key(stream, engine=engine)
            .writeStream.foreachBatch(write)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(1)
    got1 = {
        r["user_id"]: (r["total_events"], r["total_value"])
        for r in spark.read.parquet(str(outdir / "run=1")).collect()
    }
    assert got1 == {1: (2, 15.0), 2: (1, 1.0)}

    # restart with new data: totals CONTINUE from checkpointed state
    _write_chunk(
        indir,
        [
            {"event_id": 4, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "a", "value": 2.5},
            {"event_id": 5, "ts": "2024-01-01 00:01:01", "user_id": 3, "event_type": "a", "value": 7.0},
        ],
    )
    run(2)
    got2 = {
        r["user_id"]: (r["total_events"], r["total_value"])
        for r in spark.read.parquet(str(outdir / "run=2")).collect()
    }
    assert got2[1] == (3, 17.5)  # 2 prior events + 1 new, state restored
    assert got2[3] == (1, 7.0)  # new key starts fresh
    assert 2 not in got2  # update mode: unchanged keys not re-emitted


def test_log_sink_admission_and_shape(spark, tmp_path):
    records = spark.createDataFrame(
        [
            (1, 7, "boot ok", "2024-01-01 00:00:00"),
            (16, 7, "fetch failed", "2024-01-01 00:00:01"),
            (32, 8, "page the operator", "2024-01-01 00:00:02"),  # alert: masked out
        ],
        "level int, session int, message string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    packets = build_log_packets(records, component="Collector")
    rows = {r["m"]: r for r in packets.collect()}
    # alert (32) dropped by the default mask 31 (LoggerWriter.cpp:178)
    assert len(rows) == 2
    m_info = "2024-01-01 00:00:00|7|boot ok"
    assert rows[m_info]["s"] == "1"
    assert rows[m_info]["c"] == "Collector"
    assert rows[m_info]["l"] == "I"
    assert rows["2024-01-01 00:00:01|7|fetch failed"]["l"] == "E"
    # sink writes partitioned by level letter
    log_table_writer(str(tmp_path / "logs"))(packets, 0)
    back = spark.read.parquet(str(tmp_path / "logs"))
    assert sorted(r["l"] for r in back.collect()) == ["E", "I"]


def test_kv_text_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [({"s": "1", "t": "rating", "x": "a=b"},), ({"s": "2", "f": "in.cdr"},)],
        "attrs map<string,string>",
    )
    out = str(tmp_path / "wire")
    write_kv_text(df, out)
    back = SOURCES.read(spark, "kv_text", out)
    got = {r["s"]: r for r in back.collect()}
    assert got[1]["t"] == "rating" and got[1]["attrs"]["x"] == "a=b"
    assert got[2]["f"] == "in.cdr"


def test_kv_text_write_separator_clash_fails_in_pass(spark, tmp_path):
    """The separator guard runs IN-ROW inside the write pass (no extra
    filter+count scan of the output); a value containing the separator
    aborts the write with a clear message."""
    import pytest as _pytest

    bad = spark.createDataFrame(
        [({"s": "has|pipe"},)], "attrs map<string,string>"
    )
    with _pytest.raises(Exception, match="separator .* occurs inside"):
        write_kv_text(bad, str(tmp_path / "bad"))


def test_progress_logger_emits_log_packets(spark, tmp_path):
    """G4 x A7: the listener turns query lifecycle events into
    LoggerWriter-shaped packets (s/c/l/m) that the log sink can carry."""
    import time as _time

    from etl_work_flow_for_big_data_spark.streaming.monitor import (
        attach_progress_logger,
    )

    logger = attach_progress_logger(spark, component="TestMonitor")
    try:
        indir = tmp_path / "in"
        indir.mkdir()
        (indir / "a.txt").write_text("hello\nworld\n")
        stream = spark.readStream.format("text").load(str(indir))
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener bus delivers asynchronously; poll briefly
        got = []
        for _ in range(40):
            got += logger.take()
            if any("started" in p["m"] for p in got) and any(
                "terminated" in p["m"] for p in got
            ):
                break
            _time.sleep(0.25)
        assert any("started" in p["m"] for p in got)
        assert any("terminated cleanly" in p["m"] for p in got)
        for p in got:
            assert p["s"] == "1" and p["c"] == "TestMonitor"
            assert p["l"] in "IDWCEAN"
            assert p["m"].count("|") >= 2  # ts|session|message
    finally:
        spark.streams.removeListener(logger)


def test_kv_text_write_newline_in_value_fails(spark, tmp_path):
    """A raw newline inside a value would silently split into bogus
    entries after the separator translate — caught in-row like the
    separator clash."""
    import pytest as _pytest

    bad = spark.createDataFrame(
        [({"s": "has\nnewline"},)], "attrs map<string,string>"
    )
    with _pytest.raises(Exception, match="newline"):
        write_kv_text(bad, str(tmp_path / "bad"))


class _StubValueState:
    """Duck-typed ValueState: exists/get/update, no JVM behind it."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _StubHandle:
    """Duck-typed StatefulProcessorHandle serving stub ValueStates."""

    def __init__(self):
        self.states = {}
        self.requested_schemas = {}

    def getValueState(self, name, schema):
        self.requested_schemas[name] = schema
        return self.states.setdefault(name, _StubValueState())


def test_tws_processor_semantics_without_protobuf():
    """RunningTotalsProcessor's accumulate/round semantics, driven
    directly with a stub handle — protobuf is needed only to EXECUTE
    a transformWithState query (its Python state server), not to
    exercise the processor logic, so this coverage holds even in the
    sandbox where the streaming-integration tws test must skip
    (VERDICT r7 'Next round' #2)."""
    import pandas as pd

    from etl_work_flow_for_big_data_spark.streaming.stateful import (
        RUNNING_TOTALS_STATE,
        RunningTotalsProcessor,
    )

    handle = _StubHandle()
    proc = RunningTotalsProcessor("user_id", "value")
    proc.init(handle)
    assert handle.requested_schemas == {"totals": RUNNING_TOTALS_STATE}

    # first micro-batch for key 1: two Arrow chunks, fresh state
    out1 = list(
        proc.handleInputRows(
            (1,),
            iter([
                pd.DataFrame({"value": [10.0, 5.0]}),
                pd.DataFrame({"value": [2.5]}),
            ]),
            None,
        )
    )
    assert len(out1) == 1
    row = out1[0].iloc[0]
    assert (row["user_id"], row["batch_events"]) == (1, 3)
    assert (row["total_events"], row["total_value"]) == (3, 17.5)
    assert list(out1[0].columns) == [
        "user_id", "batch_events", "total_events", "total_value",
    ]

    # second micro-batch CONTINUES from state; the restart analog is a
    # NEW processor instance re-init'ed on the same handle (state came
    # back from the checkpoint, the object did not)
    proc2 = RunningTotalsProcessor("user_id", "value")
    proc2.init(handle)
    out2 = list(
        proc2.handleInputRows((1,), iter([pd.DataFrame({"value": [0.1, 0.2]})]), None)
    )
    row2 = out2[0].iloc[0]
    assert (row2["batch_events"], row2["total_events"]) == (2, 5)
    # 17.5 + 0.1 + 0.2 binary-float drift is squashed by the round-6
    # contract (matches the legacy engine's emitted values)
    assert row2["total_value"] == 17.8
    assert handle.states["totals"].get() == (5, 17.8)
    proc2.close()


def test_stateful_engine_gate_negative_paths(spark):
    """The tws capability gate is honest, not a silent downgrade:
    engine='auto' on a runtime without protobuf builds the legacy
    FlatMapGroupsInPandasWithState plan, and an EXPLICIT engine='tws'
    raises a clear ImportError at build time instead of crashing the
    streaming Python worker at query start with an opaque
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .withColumnRenamed("value", "user_id")
        .withColumn("value", F.lit(1.0))
    )
    plan = (
        running_totals_per_key(stream, engine="auto")
        ._jdf.queryExecution().analyzed().toString()
    )
    if tws_available():
        assert "TransformWithState" in plan
    else:
        assert "FlatMapGroupsInPandasWithState" in plan
        with pytest.raises(ImportError, match="protobuf"):
            running_totals_per_key(stream, engine="tws")
    with pytest.raises(ValueError, match="engine"):
        running_totals_per_key(stream, engine="bogus")
