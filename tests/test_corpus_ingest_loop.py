"""Incremental corpus ingest as ONE composed loop: the daily-crawl
pattern an LLM data pipeline runs — document files land in waves, each
file is ingested exactly once through the marker ledger
(MFramework.cpp:1286-1302 semantics, e/sources/ledger.py), the bronze
corpus accumulates, and corpus prep (quality gate → exact dedup across
EVERYTHING ingested so far) re-derives the clean corpus after every
run.

This composes pieces covered separately (ledger in test_ledger, dedup
in the oracle suite) and injects the crash that matters for a corpus:
a file's parquet lands but the run dies BEFORE the marker is written.
The retry reprocesses the file; the sink writes each landing file to
its own deterministic subdir in overwrite mode, so the replay replaces
its own partial output — the same per-unit-overwrite idempotency the
streaming sink uses (streaming/sinks.py), here on the batch ingest
path. The final assertion is the only one that matters at 100 TB:
after crash + retry + a duplicate file re-drop, the clean corpus has
every unique document exactly once and the planted cross-wave
duplicate is collapsed to its first doc_id.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.operators.dedup import dedup_exact
from etl_work_flow_for_big_data_spark.sources.ledger import (
    FileLedger,
    process_incremental,
)

# Wave 1 drops two files; wave 2 drops one new file plus a re-drop of
# an ALREADY-PROCESSED file (upstream re-publishes happen; the ledger
# must skip it) — and doc 205 is an exact text duplicate of doc 101
# (cross-wave duplicate: only the accumulated-corpus dedup can see it).
_WAVE1 = {
    "crawl_a.jsonl": '{"doc_id": 101, "text": "alpha beta gamma"}\n'
                     '{"doc_id": 102, "text": "delta epsilon"}\n',
    "crawl_b.jsonl": '{"doc_id": 103, "text": "zeta eta theta iota"}\n'
                     '{"doc_id": 104, "text": "x"}\n',  # fails quality gate
}
_WAVE2 = {
    "crawl_c.jsonl": '{"doc_id": 205, "text": "alpha beta gamma"}\n'
                     '{"doc_id": 206, "text": "kappa lambda mu"}\n',
    "crawl_b.jsonl": _WAVE1["crawl_b.jsonl"],  # unchanged re-drop
}

_SCHEMA = "doc_id LONG, text STRING"


def _drop(landing: str, files: dict[str, str]) -> None:
    for name, body in files.items():
        with open(os.path.join(landing, name), "w") as f:
            f.write(body)


def _make_sink(bronze: str, crash_on: str | None = None):
    """Per-file parquet writer: one deterministic subdir per landing
    file, overwrite mode — replay-idempotent. Optionally dies AFTER
    writing (before the caller's ledger marker) for one file."""

    def sink(df, path):
        sub = os.path.join(bronze, os.path.basename(path).replace(".", "_"))
        df.write.mode("overwrite").parquet(sub)
        if crash_on and os.path.basename(path) == crash_on:
            raise RuntimeError(f"injected crash after writing {path}")

    return sink


def _clean_corpus(spark, bronze):
    """Quality gate + exact dedup over the accumulated bronze corpus."""
    docs = spark.read.schema(_SCHEMA).parquet(os.path.join(bronze, "*"))
    gated = docs.filter(F.size(F.split("text", " ")) >= 2)
    keepers = dedup_exact(gated, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    return gated.join(keepers, "doc_id", "semi")


def test_crash_retry_and_redrop_yield_exactly_once_corpus(spark, tmp_path):
    landing = str(tmp_path / "landing")
    bronze = str(tmp_path / "bronze")
    os.makedirs(landing)
    os.makedirs(bronze)
    ledger = FileLedger(str(tmp_path / "ledger"))

    # wave 1: both files ingest cleanly
    _drop(landing, _WAVE1)
    done = process_incremental(
        spark, landing, ledger, _make_sink(bronze), fmt="json", schema=_SCHEMA
    )
    assert done == ["crawl_a.jsonl", "crawl_b.jsonl"]
    clean1 = {r["doc_id"] for r in _clean_corpus(spark, bronze).collect()}
    assert clean1 == {101, 102, 103}  # 104 fails the quality gate

    # wave 2 lands; the run CRASHES after crawl_c's parquet is written
    # but before its marker — and crawl_b's re-drop must be skipped
    # (its marker survived), not reprocessed
    _drop(landing, _WAVE2)
    with pytest.raises(RuntimeError, match="injected crash"):
        process_incremental(
            spark, landing, ledger,
            _make_sink(bronze, crash_on="crawl_c.jsonl"),
            fmt="json", schema=_SCHEMA,
        )
    assert not ledger.is_done("crawl_c.jsonl")  # crash -> no marker
    assert ledger.is_done("crawl_b.jsonl")

    # retry run: only crawl_c is (re)processed; its overwrite-mode
    # subdir replaces the pre-crash output instead of duplicating it
    done = process_incremental(
        spark, landing, ledger, _make_sink(bronze), fmt="json", schema=_SCHEMA
    )
    assert done == ["crawl_c.jsonl"]

    # the only assertion that matters: exactly-once corpus, with the
    # cross-wave duplicate (205 == 101) collapsed to the first doc_id
    rows = _clean_corpus(spark, bronze).collect()
    assert {r["doc_id"] for r in rows} == {101, 102, 103, 206}
    assert len(rows) == 4

    # bronze itself holds each ingested row exactly once (no replay
    # double-append hiding behind the dedup)
    bronze_ids = sorted(
        r["doc_id"]
        for r in spark.read.schema(_SCHEMA)
        .parquet(os.path.join(bronze, "*"))
        .collect()
    )
    assert bronze_ids == [101, 102, 103, 104, 205, 206]
