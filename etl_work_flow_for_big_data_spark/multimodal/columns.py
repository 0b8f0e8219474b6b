"""Multimodal column plumbing: binary payloads + metadata + Pandas-UDF
feature extraction (SURVEY.md §2.I I5).

Media columns are opaque ``binary`` with a typed metadata struct; all
per-record compute runs as Arrow-batched ``mapInPandas`` (never
row-at-a-time Python). Decode is layered by what this environment can
honestly do:

- ``decode_media``: REAL header-level decode — container format +
  pixel dimensions parsed from magic bytes (PNG/GIF/BMP/JPEG), zero
  dependencies; unknown/corrupt/null payloads yield nulls, never task
  failures;
- ``decode_pixels``: real PIL-backed pixel decode when PIL is
  importable (or any injected per-record decoder); otherwise raises
  ``NotImplementedError`` with wiring instructions (the honest gate —
  no fake pixels, ever);
- ``extract_features`` / ``sample_frames``: deterministic fakes that
  exercise the REAL Spark plumbing — schema contracts, Arrow batch
  shapes, partition-parallel execution — so the pipeline around the
  decoder is fully tested.

At 100 TB: binaries ride in their own column (parquet column pruning
keeps metadata-only queries from touching bytes); mapInPandas keeps
the Python boundary amortized over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_work_flow_for_big_data_spark.catalog import fan_out

#: schema of the metadata struct attached alongside every media column
MEDIA_META_SCHEMA = "struct<mime:string,n_bytes:long,source:string>"


def attach_binary(
    df: DataFrame, text_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize a binary media column (here: utf-8 bytes of a text
    column — the fixture stand-in for real image/audio payloads) plus
    its metadata struct."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.col("source").alias("source")
            if "source" in df.columns
            else F.lit(None).cast("string").alias("source"),
        ),
    )


#: container formats whose headers ``decode_media`` parses natively
HEADER_FORMATS = ("png", "gif", "bmp", "jpeg")

DECODE_SCHEMA = "id long, format string, width int, height int, n_bytes long"


def _parse_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from container magic bytes — pure
    stdlib, no imaging dependency. Unknown payloads return
    (None, None, None); a recognized magic with a truncated/missing
    dimension header returns (format, None, None) — consistently for
    every format. Never raises: at 100 TB a corrupt record must not
    kill the task."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 24:  # magic present, IHDR dims truncated
            return ("png", None, None)
        # 8-byte signature, IHDR length+type, then 4-byte BE width/height
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            return ("gif", None, None)
        # logical screen descriptor: 2-byte LE width/height at offset 6
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM":
        if len(b) < 26:
            return ("bmp", None, None)
        # BITMAPINFOHEADER: 4-byte LE signed width/height at 18/22
        # (height may be negative = top-down rows)
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return ("bmp", abs(w), abs(h))
    if b[:2] == b"\xff\xd8":
        # walk marker segments to the first SOFn (dimensions live there)
        o, n = 2, len(b)
        while o + 9 <= n and b[o] == 0xFF:
            # 0xFF fill/padding bytes are legal between segments: the
            # marker is the first non-0xFF byte. Without this skip, a
            # fill byte falls into the length-skip branch and reads a
            # garbage length, derailing the walk.
            if b[o + 1] == 0xFF:
                o += 1
                continue
            marker = b[o + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                o += 2  # standalone marker, no length field
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(b[o + 7 : o + 9], "big"),
                    int.from_bytes(b[o + 5 : o + 7], "big"),
                )
            o += 2 + int.from_bytes(b[o + 2 : o + 4], "big")
        return ("jpeg", None, None)
    return (None, None, None)


def decode_media(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Header-level media decode, dependency-free: container format and
    pixel dimensions parsed from magic bytes (PNG IHDR, GIF logical
    screen descriptor, BMP BITMAPINFOHEADER, JPEG SOFn scan) in an
    Arrow-batched ``mapInPandas`` kernel. Unknown formats / truncated
    headers yield null format/dims — never a task failure. Full pixel
    decode (the PIL/ffmpeg slot) remains honestly gated in
    ``decode_pixels``."""
    # fan_out (r15): a one-file binary table scans as ONE task, so the
    # whole Arrow kernel ran in a single Python worker; no-op when the
    # input already has >= cores splits (see catalog.fan_out)
    src = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (nullable binary columns are routine) parse
            # to all-null, honoring the never-kill-the-task contract
            parsed = [
                (None, None, None) if b is None else _parse_header(bytes(b))
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in pdf["content"]],
                        dtype="Int64",
                    ),
                }
            )

    return src.mapInPandas(parse, schema=DECODE_SCHEMA)


PIXELS_SCHEMA = "id long, width int, height int, mode string, pixels binary"


def decode_pixels(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    decoder=None,
) -> DataFrame:
    """Full pixel decode through the standard Arrow ``mapInPandas``
    shape (same plumbing as ``decode_media``/``extract_features``).
    ``content_col`` keeps its historical second-positional slot.

    Decoder resolution, honest at every step:

    - ``decoder`` given — a ``bytes -> (width, height, mode,
      pixel_bytes)`` callable — it is used as-is (the injection seam,
      also how the decode path is exercised in imaging-less CI);
    - PIL importable — PIL-backed decode (``Image.open`` + ``load`` +
      ``tobytes``), imported INSIDE the kernel so each executor
      resolves it locally;
    - neither — ``NotImplementedError`` with wiring instructions.
      Gate, don't fake: no synthetic pixels from this function, ever.

    Per-record DECODE failures (corrupt/unknown/null payloads) yield
    all-null rows, never task failures — at 100 TB a corrupt record
    must not kill the job (same contract as ``decode_media``).
    ``ImportError`` and ``MemoryError`` inside the kernel are NOT
    record failures and are re-raised: an executor without PIL, or one
    whose memory a payload exhausts mid-decode, must fail the task
    loudly, not silently null out its whole partition.
    """
    if decoder is None:
        try:
            import importlib

            importlib.import_module("PIL.Image")
        except ImportError as exc:
            raise NotImplementedError(
                "pixel decode requires PIL (or an injected decoder); "
                "neither is available in this environment. Wire a real "
                "decoder as decode_pixels(df, decoder=fn) where fn: "
                "bytes -> (width, height, mode, pixel_bytes), or "
                "install pillow. The surrounding Spark plumbing "
                "(schema, Arrow batching, partition parallelism) is "
                "exercised by the injected-decoder tests, and "
                "header-level format/dimension decode is available "
                "dependency-free via decode_media."
            ) from exc

        def decoder(b: bytes):
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(b))
            img.load()
            return (img.width, img.height, img.mode, img.tobytes())

    # fan_out (r15): a one-file binary table scans as ONE task, so the
    # whole Arrow kernel ran in a single Python worker; no-op when the
    # input already has >= cores splits (see catalog.fan_out)
    src = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, modes, px = [], [], [], []
            for b in pdf["content"]:
                try:
                    w, h, mode, pix = decoder(bytes(b))  # raises on None
                    ws.append(w), hs.append(h), modes.append(mode), px.append(pix)
                except (ImportError, MemoryError):
                    # systemic, not per-record: executor lacks the
                    # imaging library, or the payload OOMed the decode
                    # — fail the task, don't silently null data
                    raise
                except Exception:  # corrupt/unknown/null → null row
                    ws.append(None), hs.append(None)
                    modes.append(None), px.append(None)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mode": modes,
                    "pixels": px,
                }
            )

    return src.mapInPandas(run, schema=PIXELS_SCHEMA)


FEATURE_SCHEMA = "id long, n_bytes long, features array<float>"


def extract_features(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Deterministic fake feature extraction over Arrow batches — the
    mapInPandas twin of a real embedding model. Features are a stable,
    cross-engine-checkable function of the bytes: byte length plus
    three 16-bit words of the md5 digest (each < 2^24, so exact in
    float32). An oracle can recompute every value in pure SQL
    (octet_length + md5 hex substrings), which lets the driver
    hash-check this Python stage end-to-end."""
    import hashlib

    # fan_out (r15): a one-file binary table scans as ONE task, so the
    # whole Arrow kernel ran in a single Python worker; no-op when the
    # input already has >= cores splits (see catalog.fan_out)
    src = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    )

    def fake_featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                # NULL payload → all-null row (same never-kill-the-task
                # contract as decode_media; duck's md5(NULL) is NULL)
                if b is None:
                    feats.append(None)
                    continue
                h = hashlib.md5(bytes(b)).hexdigest()
                feats.append(
                    [
                        float(len(b)),
                        float(int(h[0:4], 16)),
                        float(int(h[4:8], 16)),
                        float(int(h[8:12], 16)),
                    ]
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in pdf["content"]],
                        dtype="Int64",
                    ),
                    "features": feats,
                }
            )

    return src.mapInPandas(fake_featurize, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "id long, n_bytes long, resized binary"


def resize_media(
    df: DataFrame, id_col: str, content_col: str = "content", factor: int = 4
) -> DataFrame:
    """Deterministic fake resize (image-downsample twin): keep every
    ``factor``-th byte — the 1-to-1 binary→binary mapInPandas shape a
    real thumbnailer/resampler uses (smaller payload out, same row
    count). Exact values are SQL-recomputable over ASCII fixtures, so
    the Python stage is oracle-checkable like the feature/frame
    fakes."""
    # fan_out (r15): a one-file binary table scans as ONE task, so the
    # whole Arrow kernel ran in a single Python worker; no-op when the
    # input already has >= cores splits (see catalog.fan_out)
    src = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    )

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload → all-null row (never-kill-the-task contract)
            resized = [None if b is None else bytes(b)[::factor] for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in pdf["content"]],
                        dtype="Int64",
                    ),
                    "resized": resized,
                }
            )

    return src.mapInPandas(fake_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"


def sample_frames(
    df: DataFrame, id_col: str, content_col: str = "content", stride: int = 64
) -> DataFrame:
    """Deterministic fake frame sampling (video-decode twin): slices
    the payload every ``stride`` bytes, one output row per 'frame' —
    exercises the 1-to-N mapInPandas shape real frame extraction uses."""
    # fan_out (r15): a one-file binary table scans as ONE task, so the
    # whole Arrow kernel ran in a single Python worker; no-op when the
    # input already has >= cores splits (see catalog.fan_out)
    src = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    )

    def fake_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf["id"], pdf["content"]):
                # NULL payload → no frames (a 1-to-N stage's natural
                # null semantics: nothing to slice, zero output rows —
                # matches the oracle's empty generate_series)
                if b is None:
                    continue
                n = max(1, (len(b) + stride - 1) // stride)
                for k in range(n):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(bytes(b[k * stride : (k + 1) * stride]))
            # explicit dtypes: an all-null batch yields empty lists,
            # and empty object columns must still convert to long
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "frame_bytes": frames,
                }
            )

    return src.mapInPandas(fake_frames, schema=FRAME_SCHEMA)
