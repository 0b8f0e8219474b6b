"""Multimodal query family (SURVEY.md §2.I I5) over ``documents``
treated as opaque binary media.

``mm_binary_meta`` is fully oracle-checked (byte lengths + content
hashes are engine-independent). ``mm_features`` exercises the real
mapInPandas plumbing with a deterministic fake decoder — Python-side,
so it registers without an oracle (driver rows-only check); its exact
values are pinned by unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.catalog import load_table
from etl_work_flow_for_big_data_spark.multimodal.columns import (
    attach_binary,
    extract_features,
)
from etl_work_flow_for_big_data_spark.queries import query


@query(
    "mm_binary_meta",
    """
    SELECT doc_id,
           'application/octet-stream'    AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           source,
           md5(text)                     AS content_hash
    FROM documents
    ORDER BY doc_id
    """,
    doc="I5 multimodal metadata: opaque binary column + typed metadata "
    "struct; metadata-only scans never read the payload column "
    "(parquet column pruning)",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary(load_table(spark, sf_dir, "documents"), "text")
    return d.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.source").alias("source"),
        F.md5("content").alias("content_hash"),
    ).orderBy("doc_id")


@query(
    "mm_features",
    None,  # mapInPandas (Python stage) — rows-only driver check; exact
    # values pinned by tests/test_multimodal.py
    doc="I5 feature extraction over Arrow batches (mapInPandas) with a "
    "deterministic fake decoder — the real-decoder slot for "
    "image/audio embedding models",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary(load_table(spark, sf_dir, "documents"), "text")
    return extract_features(d, "doc_id").orderBy("id")
