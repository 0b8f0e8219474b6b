"""Multimodal column plumbing tests (I5): binary columns + metadata,
Arrow-batched feature extraction, 1-to-N frame sampling, gated decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.multimodal.columns import (
    attach_binary,
    decode_media,
    extract_features,
    sample_frames,
)


@pytest.fixture
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world", "s1"), (2, "x" * 130, "s2")],
        "doc_id long, text string, source string",
    )
    return attach_binary(df, "text")


def test_metadata_struct(media):
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[1]["media_meta"]["n_bytes"] == 11
    assert rows[1]["media_meta"]["mime"] == "application/octet-stream"
    assert rows[1]["media_meta"]["source"] == "s1"
    assert bytes(rows[1]["content"]) == b"hello world"


def test_extract_features_deterministic(media):
    import hashlib

    rows = {r["id"]: r for r in extract_features(media, "doc_id").collect()}
    # [len, md5 hex words 0:4, 4:8, 8:12] — SQL-recomputable (oracle)
    h = hashlib.md5(b"hello world").hexdigest()
    assert rows[1]["features"] == [
        11.0,
        float(int(h[0:4], 16)),
        float(int(h[4:8], 16)),
        float(int(h[8:12], 16)),
    ]
    assert rows[2]["n_bytes"] == 130
    # schema contract: array<float>
    feats_field = extract_features(media, "doc_id").schema["features"]
    assert feats_field.simpleString() == "features:array<float>"


def test_sample_frames_one_to_n(media):
    rows = sample_frames(media, "doc_id", stride=64).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[1]) == 1  # 11 bytes -> 1 frame
    assert len(by_id[2]) == 3  # 130 bytes, stride 64 -> 3 frames
    assert bytes(by_id[2][2]["frame_bytes"]) == b"xx"  # tail frame 2 bytes


def test_decode_gated(media):
    with pytest.raises(NotImplementedError, match="decoder"):
        decode_media(media)


def test_metadata_scan_prunes_payload(media, tmp_path):
    """Metadata-only query over parquet must not read the content column
    (ReadSchema shows the pruned scan)."""
    path = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(path)
    spark = media.sparkSession
    plan = (
        spark.read.parquet(path)
        .select(F.col("media_meta.n_bytes"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in plan


def test_resize_media_strides_bytes(media):
    from etl_work_flow_for_big_data_spark.multimodal.columns import resize_media

    rows = {r["id"]: r for r in resize_media(media, "doc_id", factor=4).collect()}
    assert bytes(rows[1]["resized"]) == b"hello world"[::4]
    assert rows[2]["n_bytes"] == 130
    assert len(bytes(rows[2]["resized"])) == 33  # ceil(130/4)
