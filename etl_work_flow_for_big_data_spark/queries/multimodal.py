"""Multimodal query family (SURVEY.md §2.I I5) over ``documents``
treated as opaque binary media.

All four queries are fully hash-oracle-checked — including the three
mapInPandas stages (``mm_features``, ``mm_frames``, ``mm_resize``),
whose deterministic fake decoders emit md5/length-based outputs an SQL
oracle recomputes exactly; unit tests additionally pin exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.catalog import load_table
from etl_work_flow_for_big_data_spark.multimodal.columns import (
    attach_binary,
    extract_features,
    sample_frames,
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
    )


@query(
    "mm_features",
    """
    SELECT doc_id AS id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) AS DOUBLE) AS f0,
           CAST(CAST('0x' || substring(md5(text), 1, 4) AS INT) AS DOUBLE) AS f1,
           CAST(CAST('0x' || substring(md5(text), 5, 4) AS INT) AS DOUBLE) AS f2,
           CAST(CAST('0x' || substring(md5(text), 9, 4) AS INT) AS DOUBLE) AS f3
    FROM documents
    ORDER BY doc_id
    """,
    doc="I5 feature extraction over Arrow batches (mapInPandas) with a "
    "deterministic fake decoder — the real-decoder slot for image/audio "
    "embedding models. The query projects the feature vector to scalar "
    "doubles (driver canonicalizer can't sort array columns); the md5 "
    "feature family makes the Python stage fully hash-oracle-checkable. "
    "Library callers get the raw array<float> from extract_features.",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary(load_table(spark, sf_dir, "documents"), "text")
    feats = extract_features(d, "doc_id")
    return feats.select(
        "id",
        "n_bytes",
        F.element_at("features", 1).cast("double").alias("f0"),
        F.element_at("features", 2).cast("double").alias("f1"),
        F.element_at("features", 3).cast("double").alias("f2"),
        F.element_at("features", 4).cast("double").alias("f3"),
    )


@query(
    "mm_frames",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS nb
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id AS id,
           CAST(k AS INT) AS frame_idx,
           CAST(length(substring(hx, CAST(k*128+1 AS BIGINT), 128)) / 2
                AS BIGINT)                                        AS n_frame_bytes,
           md5(substring(hx, CAST(k*128+1 AS BIGINT), 128))       AS frame_hash
    FROM h,
         unnest(generate_series(
             0,
             GREATEST(CAST(ceil(nb / 64.0) AS BIGINT), 1) - 1
         )) AS t(k)
    ORDER BY id, frame_idx
    """,
    doc="I5 frame sampling (video-decode twin): 1-to-N mapInPandas over "
    "Arrow batches, one row per 64-byte 'frame'; projected to "
    "length+md5 so the Python stage is hash-oracle-checked. Both sides "
    "hash the frame's HEX encoding: hex is the byte-true view both "
    "engines can slice (DuckDB has no BLOB substring/md5, and slicing "
    "characters diverges the moment a multibyte payload splits across "
    "a frame boundary). NULL-text docs have no frames on either side.",
)
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_binary(load_table(spark, sf_dir, "documents"), "text")
    frames = sample_frames(d, "doc_id", stride=64)
    return frames.select(
        "id",
        "frame_idx",
        F.octet_length("frame_bytes").cast("bigint").alias("n_frame_bytes"),
        # md5 over the hex view — byte-true on both engines (see oracle)
        F.md5(F.hex("frame_bytes")).alias("frame_hash"),
    )


def _be(col, nbytes: int):
    """Big-endian unsigned bytes of an int column (JVM-side: hex→pad→
    unhex — no Python in the synth path)."""
    return F.unhex(F.lpad(F.hex(col), nbytes * 2, "0"))


def _le(col, nbytes: int):
    """Little-endian unsigned bytes — BE hex with byte pairs reversed."""
    h = F.lpad(F.hex(col), nbytes * 2, "0")
    pairs = [F.substring(h, i * 2 + 1, 2) for i in reversed(range(nbytes))]
    return F.unhex(F.concat(*pairs))


@query(
    "mm_decode",
    """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                           WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
           CAST(16 + doc_id % 1009 AS INT) AS width,
           CAST(16 + doc_id % 509  AS INT) AS height
    FROM documents
    ORDER BY doc_id
    """,
    doc="I5 header-level media decode (dependency-free): PNG/GIF/BMP/"
    "JPEG container headers are SYNTHESIZED with JVM-side byte "
    "expressions (hex/unhex/concat — endianness encoded in SQL, "
    "independent of the Python parser), prepended to the document "
    "payload, then parsed back by the Arrow-batched decode_media "
    "kernel. The oracle recomputes format/width/height closed-form "
    "from doc_id, so a parser endianness/offset bug hash-mismatches. "
    "Real pixel decode stays gated (decode_pixels).",
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_work_flow_for_big_data_spark.multimodal.columns import decode_media

    d = load_table(spark, sf_dir, "documents")
    w = (F.lit(16) + F.col("doc_id") % 1009).cast("int")
    h = (F.lit(16) + F.col("doc_id") % 509).cast("int")
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),
        F.lit((13).to_bytes(4, "big")),
        F.lit(b"IHDR"),
        _be(w, 4),
        _be(h, 4),
        F.lit(b"\x08\x06\x00\x00\x00"),
    )
    gif = F.concat(F.lit(b"GIF89a"), _le(w, 2), _le(h, 2), F.lit(b"\x00\x00\x00"))
    bmp = F.concat(
        F.lit(b"BM"),
        F.lit((26).to_bytes(4, "little")),
        F.lit(b"\x00\x00\x00\x00"),
        F.lit((26).to_bytes(4, "little")),
        F.lit((40).to_bytes(4, "little")),
        _le(w, 4),
        _le(h, 4),
    )
    jpeg = F.concat(
        F.lit(b"\xff\xd8\xff\xc0"),
        F.lit((17).to_bytes(2, "big")),
        F.lit(b"\x08"),
        _be(h, 2),
        _be(w, 2),
        F.lit(b"\x00\x00"),
    )
    m = F.col("doc_id") % 4
    hdr = F.when(m == 0, png).when(m == 1, gif).when(m == 2, bmp).otherwise(jpeg)
    # coalesce: a NULL text must not null out the whole concat — the
    # header-derived oracle columns (format/width/height) are
    # independent of text nullability, and the driver is known to
    # regenerate fixtures between rounds
    payload = d.withColumn(
        "content",
        F.concat(hdr, F.coalesce(F.encode("text", "UTF-8"), F.lit(b""))),
    )
    return decode_media(payload, "doc_id").select(
        F.col("id").alias("doc_id"), "format", "width", "height"
    )


@query(
    "mm_resize",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS nb
               FROM documents)
    SELECT doc_id AS id,
           CAST(nb AS BIGINT)                      AS n_bytes,
           CAST(ceil(nb / 4.0) AS BIGINT)          AS n_resized,
           CASE WHEN hx IS NULL THEN NULL
                ELSE md5(COALESCE(array_to_string(list_transform(
                    range(0, CAST(ceil(nb / 4.0) AS BIGINT)),
                    __i -> substring(hx, CAST(__i * 8 + 1 AS BIGINT), 2)), ''), ''))
           END                                     AS resized_hash
    FROM h
    """,
    doc="I5 resize (image-downsample twin): keep every 4th byte via a "
    "1-to-1 binary mapInPandas stage; projected to length + md5 over "
    "the HEX view — byte-true on any payload (char-striding diverges "
    "on multibyte text, and DuckDB has no BLOB substring/md5). The "
    "empty payload resizes to an empty blob (md5 of ''), a NULL "
    "payload to NULL — both mirrored.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_work_flow_for_big_data_spark.multimodal.columns import resize_media

    d = attach_binary(load_table(spark, sf_dir, "documents"), "text")
    r = resize_media(d, "doc_id", factor=4)
    return r.select(
        "id",
        "n_bytes",
        F.octet_length("resized").cast("bigint").alias("n_resized"),
        # md5 over the hex view — byte-true on both engines (see oracle)
        F.md5(F.hex("resized")).alias("resized_hash"),
    )
