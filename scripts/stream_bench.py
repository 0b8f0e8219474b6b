"""Streaming throughput record — the surface bench.py doesn't see.

bench.py measures batch queries; the reference is a streaming
mediation system (continuous CDR ingest → parse → rate → route,
MFramework.cpp:1209-1319), so the perf record needs a sustained-ingest
measurement too (VERDICT r9 next-round #4). This script drives the two
load-bearing streaming shapes over a file source at
``maxFilesPerTrigger=1`` (one micro-batch per file — the same
batch-cadence contract the mediation tests pin) and reads the numbers
Structured Streaming itself reports per batch
(``query.recentProgress``), not wall-clock guesses:

1. **mediation** — the composed stateless path (kv parse → validity
   filter → content route → broadcast tariff join → rate), sunk
   through a checkpointed foreachBatch noop write. Reported: rows/s
   sustained (input rows / Σ triggerExecution), per-batch latency
   p50/p95, and checkpoint overhead (offset-log + commit ms as a
   share of trigger time) — the exactly-once tax.
2. **windowed** — event-time tumbling window + watermark aggregation
   (the stateful path whose memory bound IS the watermark contract).
   Additionally reported: state-store rows and bytes over the run
   (final batch's stateOperators), i.e. does state stay bounded while
   data keeps arriving.
3. **dedup** — streaming exact dedup with bounded state
   (``dropDuplicatesWithinWatermark`` via
   ``streaming.windows.dedup_within_watermark``): at 100 TB
   ingest-side dedup is the FIRST thing a corpus pipeline runs, and
   its scale contract is the same watermark state bound as the
   windowed case — dedup keys are held only inside the watermark
   horizon, so state tracks the horizon, not the stream length.
   ~25% of rows are duplicates planted within AND across adjacent
   micro-batches (the cross-batch case is why state exists at all).
   Reported: rows/s plus state rows/bytes at two volumes.
4. **dedup_h1** — the BANDED near-dup ingest gate (r12:
   ``near_dedup_within_watermark(mode="banded")``, Hamming-1
   tolerance via two chained 16-bit-band dedup stages). The scale
   contract: state = two int rows per admitted-frontier doc in the
   horizon — ×2 the exact gate's, still invariant in stream length;
   ``state_rows_by_op`` records the per-band split.
5. **stateful** — the G8 custom per-key processor
   (running_totals_per_key: two scalars of keyed, checkpointed state
   per user; transformWithState when the runtime can execute it, the
   applyInPandasWithState fallback otherwise — this sandbox lacks
   protobuf, so the record measures the fallback engine). The state
   contract under measurement: O(keys) rows regardless of rows
   ingested.

Volumes default to 50k and 200k rows (20 micro-batches each) so the
record shows whether per-batch overhead amortizes — the 100-TB
question for a streaming path is rows/s per core at steady state, and
fixed batch overhead is the small-scale artifact to see past.

Writes ONE JSON object to ``BENCH_STREAM.json`` (repo root) unless an
output path is given; bench.py attaches the committed record to its
output line under ``"streaming"`` so the per-round BENCH_r{N} capture
carries it.

Usage: python scripts/stream_bench.py [out_json] [rows_csv]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 20


def _percentile(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    i = max(0, min(len(xs) - 1, round(p * (len(xs) - 1))))
    return xs[i]


def _drain(writer, timeout_s: int = 600):
    q = writer.start()
    finished = q.awaitTermination(timeout_s)
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        # a timed-out query's partial recentProgress must not fold
        # into the record as a normal measurement (r10 ADVICE)
        q.stop()
        raise TimeoutError(
            f"streaming query did not drain within {timeout_s}s"
        )
    return q


def _progress_stats(q) -> dict:
    """Fold recentProgress into the record: throughput from the
    engine's own per-batch numbers, latency percentiles, checkpoint
    share (offset WAL + commit vs whole trigger)."""
    progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    rows = sum(p["numInputRows"] for p in progresses)
    trig = [p["durationMs"].get("triggerExecution", 0) for p in progresses]
    ckpt = [
        p["durationMs"].get("walCommit", 0)
        + p["durationMs"].get("commitOffsets", 0)
        + p["durationMs"].get("latestOffset", 0)
        for p in progresses
    ]
    total_s = sum(trig) / 1000.0
    out = {
        "batches": len(progresses),
        "rows": rows,
        "rows_per_sec": round(rows / total_s, 1) if total_s else None,
        "batch_ms_p50": _percentile(trig, 0.5),
        "batch_ms_p95": _percentile(trig, 0.95),
        "checkpoint_ms_p50": _percentile(ckpt, 0.5),
        "checkpoint_share": round(sum(ckpt) / max(sum(trig), 1), 3),
    }
    state = [p for p in progresses if p.get("stateOperators")]
    if state:
        # sum across operators: the banded dedup pipeline chains TWO
        # dropDuplicatesWithinWatermark stages (r12), so "state" is the
        # total the executor holds; the per-op split is kept when >1
        last_ops = state[-1]["stateOperators"]
        peak_bytes = max(
            sum(op.get("memoryUsedBytes", 0) for op in p["stateOperators"])
            for p in state
        )
        out["state_rows_final"] = sum(
            op.get("numRowsTotal") or 0 for op in last_ops
        )
        if len(last_ops) > 1:
            out["state_rows_by_op"] = [
                op.get("numRowsTotal") for op in last_ops
            ]
        out["state_bytes_peak"] = peak_bytes
    return out


def _write_kv_files(landing: str, n_rows: int) -> None:
    """kv wire-format CDR batches: N_BATCHES files, one per
    micro-batch. Four component types, ~2% dead-letter (no t),
    ~2% invalid (no s) — the mediation drop paths stay exercised."""
    per = n_rows // N_BATCHES
    types = ["voice", "data", "sms", "mms"]
    for b in range(N_BATCHES):
        lines = []
        for i in range(per):
            sid = b * per + i
            if i % 50 == 48:
                lines.append(f"t=voice|u={i % 97}.5|f=ne{b}")  # no s
            elif i % 50 == 49:
                lines.append(f"s={sid}|u={i % 97}.5|f=ne{b}")  # no t
            else:
                t = types[i % 4]
                lines.append(f"s={sid}|t={t}|u={(i % 97)}.25|f=ne{b}")
        with open(os.path.join(landing, f"b{b:04d}.cdr"), "w") as f:
            f.write("\n".join(lines) + "\n")


def bench_mediation(spark, tmp: str, n_rows: int) -> dict:
    import etl_work_flow_for_big_data_spark.operators.transforms  # noqa: F401
    from etl_work_flow_for_big_data_spark.plans.spec import PipelineSpec
    from etl_work_flow_for_big_data_spark.sources.registry import DEFAULT as SOURCES

    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    _write_kv_files(landing, n_rows)
    spec = PipelineSpec.from_rows(
        "mediation",
        [
            {"session_id": 1, "operator_name": "parse_packets",
             "next_session_id": 2},
            {"session_id": 2, "operator_name": "filter_valid",
             "params": {"required": "s"}, "next_session_id": 3},
            {"session_id": 3, "operator_name": "route_by",
             "params": {"key": "t"}, "next_session_id": None},
        ],
    )
    stream = SOURCES.read_stream(spark, "kv_text", landing, None,
                                 maxFilesPerTrigger=1)
    tariff = spark.createDataFrame(
        [("voice", 0.05), ("data", 0.10), ("sms", 0.01), ("mms", 0.02)],
        "t string, rate double",
    )
    rated = (
        spec.compile(stream)
        .withColumn("u", F.col("attrs")["u"].cast("double"))
        .join(F.broadcast(tariff), "t", "left")
        .withColumn("charge", F.round(F.col("u") * F.col("rate"), 2))
        .select("s", "route", "charge")
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    q = _drain(
        rated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
    )
    wall = time.perf_counter() - t0
    out = _progress_stats(q)
    out["wall_sec"] = round(wall, 2)
    return out


def bench_windowed(spark, tmp: str, n_rows: int) -> dict:
    from etl_work_flow_for_big_data_spark.streaming.windows import tumbling_agg

    src = os.path.join(tmp, "events")
    os.makedirs(src)
    per = n_rows // N_BATCHES
    # 1000 users, one event/user/~minute → watermark keeps ~a few
    # windows of state live while the run covers hours of event time
    base = spark.createDataFrame(
        [(i,) for i in range(per)], "i long"
    )
    for b in range(N_BATCHES):
        (
            base.select(
                (F.lit(b * per) + F.col("i")).alias("event_id"),
                (F.col("i") % 1000).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000 + b * 600) + (F.col("i") % 600)
                ).alias("ts"),
                (F.col("i") % 97 * 1.5).alias("amount"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"b{b:04d}"))
        )
    schema = "event_id long, user_id long, ts timestamp, amount double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    windowed = tumbling_agg(
        stream, ts_col="ts", window="1 minute", watermark="5 minutes",
        keys=["user_id"], value_col="amount",
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    q = _drain(
        windowed.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
    )
    wall = time.perf_counter() - t0
    out = _progress_stats(q)
    out["wall_sec"] = round(wall, 2)
    return out


def bench_dedup(spark, tmp: str, n_rows: int) -> dict:
    from etl_work_flow_for_big_data_spark.streaming.windows import (
        dedup_within_watermark,
    )

    src = os.path.join(tmp, "events")
    os.makedirs(src)
    per = n_rows // N_BATCHES
    base = spark.createDataFrame([(i,) for i in range(per)], "i long")
    for b in range(N_BATCHES):
        # ~25% duplicates: every 4th row repeats the previous row's
        # event_id; the batch's first row repeats the LAST id of the
        # previous batch (cross-batch dup — the case the state exists
        # for). Event time advances 10 min/batch under a 30-min
        # watermark, so old dedup keys age out while the run
        # progresses — state must track the horizon, not the volume.
        # The previous batch's last row is i = per-1 under the SAME
        # when/otherwise rule below (r11 advice — the old constant
        # `b*per - 2` was only its id when per % 4 == 0): repeated id
        # when (per-1) % 4 == 3, own id otherwise.
        prev_last = (
            ((b - 1) * per + (per - 2 if (per - 1) % 4 == 3 else per - 1))
            if b
            else 0
        )
        (
            base.select(
                F.when(F.col("i") == 0, F.lit(prev_last))
                .when(
                    F.col("i") % 4 == 3,
                    F.lit(b * per) + F.col("i") - 1,
                )
                .otherwise(F.lit(b * per) + F.col("i"))
                .alias("event_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000 + b * 600) + (F.col("i") % 600)
                ).alias("ts"),
                (F.col("i") % 97 * 1.5).alias("amount"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"b{b:04d}"))
        )
    schema = "event_id long, ts timestamp, amount double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    deduped = dedup_within_watermark(
        stream, keys=["event_id"], ts_col="ts", watermark="30 minutes"
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    q = _drain(
        deduped.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
    )
    wall = time.perf_counter() - t0
    out = _progress_stats(q)
    out["wall_sec"] = round(wall, 2)
    return out


def bench_dedup_h1(spark, tmp: str, n_rows: int) -> dict:
    """Banded (Hamming-1-tolerant) near-dup ingest gate (r12, VERDICT
    r11 #5): ``near_dedup_within_watermark(mode="banded")`` over
    synthetic text documents — 8 md5-derived tokens per doc, ~20%
    planted duplicates (every 5th doc repeats the previous doc's token
    set; each batch's first doc repeats the previous batch's last
    content — the cross-batch case state exists for). The contract
    under measurement: state = TWO int rows (one per band store) per
    admitted-frontier doc inside the watermark horizon — the ×2 price
    of Hamming-1 tolerance vs the exact gate's ×1 (and vs ×17 for
    multi-probe), still invariant in stream length."""
    from etl_work_flow_for_big_data_spark.streaming.windows import (
        near_dedup_within_watermark,
    )

    src = os.path.join(tmp, "docs")
    os.makedirs(src)
    per = n_rows // N_BATCHES
    base = spark.createDataFrame([(i,) for i in range(per)], "i long")
    for b in range(N_BATCHES):
        cid = (
            F.when(F.col("i") % 5 == 4, F.lit(b * per) + F.col("i") - 1)
            .otherwise(F.lit(b * per) + F.col("i"))
        )
        if b:
            # previous batch's last row is i = per-1 under the same
            # rule: repeated content when (per-1) % 5 == 4
            prev_last = (b - 1) * per + (
                per - 2 if (per - 1) % 5 == 4 else per - 1
            )
            cid = F.when(F.col("i") == 0, F.lit(prev_last)).otherwise(cid)
        text = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda j: F.concat(
                    F.lit("t"),
                    F.md5(
                        F.concat(
                            cid.cast("string"), F.lit("_"), j.cast("string")
                        )
                    ),
                ),
            ),
            " ",
        )
        (
            base.select(
                (F.lit(b * per) + F.col("i")).alias("doc_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000 + b * 600) + (F.col("i") % 600)
                ).alias("ts"),
                text.alias("text"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"b{b:04d}"))
        )
    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    gated = near_dedup_within_watermark(
        stream, "text", ts_col="ts", watermark="30 minutes", mode="banded"
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    q = _drain(
        gated.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
    )
    wall = time.perf_counter() - t0
    out = _progress_stats(q)
    out["wall_sec"] = round(wall, 2)
    return out


def bench_stateful(spark, tmp: str, n_rows: int) -> dict:
    from etl_work_flow_for_big_data_spark.streaming.stateful import (
        running_totals_per_key,
    )

    src = os.path.join(tmp, "events")
    os.makedirs(src)
    per = n_rows // N_BATCHES
    base = spark.createDataFrame([(i,) for i in range(per)], "i long")
    for b in range(N_BATCHES):
        (
            base.select(
                (F.col("i") % 1000).alias("user_id"),
                (F.col("i") % 97 * 1.5).alias("value"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"b{b:04d}"))
        )
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    totals = running_totals_per_key(stream, key="user_id", value_col="value")

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    q = _drain(
        totals.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
    )
    wall = time.perf_counter() - t0
    out = _progress_stats(q)
    out["wall_sec"] = round(wall, 2)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STREAM.json",
    )
    volumes = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [50_000, 200_000]
    )
    from etl_work_flow_for_big_data_spark.session import get_spark

    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    record: dict = {"metric": "streaming_sustained_ingest",
                    "n_batches": N_BATCHES, "pipelines": {}}
    for name, fn in (("mediation", bench_mediation), ("windowed", bench_windowed),
                     ("dedup", bench_dedup), ("dedup_h1", bench_dedup_h1),
                     ("stateful", bench_stateful)):
        record["pipelines"][name] = {}
        for n in volumes:
            tmp = tempfile.mkdtemp(prefix=f"stream_bench_{name}_{n}_")
            try:
                record["pipelines"][name][str(n)] = fn(spark, tmp, n)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            print(f"{name} @ {n}: "
                  f"{record['pipelines'][name][str(n)]}", file=sys.stderr)
    line = json.dumps(record)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
