"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container):
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (derived from
the byte content) exercises the exact Spark-side plumbing — schema,
partition sizing, UDF signature, Arrow batch shape — that a real
Pillow/torchaudio decoder would use.

Scale notes: binary payloads ride the columnar scan; ``mapInPandas``
processes them per Arrow batch (bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``), and the metadata-only
projections never touch the payload column thanks to Parquet column
pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, sample_rate int"

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feat_mean double, feat_dim int"


def to_media_table(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Build a media table from any source by treating a column's bytes
    as an opaque payload (the testdata stand-in for real image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


HEADER_MAGIC = "IMG1"
HEADER_BYTES = 12  # 4-byte magic + 4 hex digits width + 4 hex digits height


def add_media_header(media: DataFrame, magic: str = HEADER_MAGIC) -> DataFrame:
    """Prepend a deterministic 12-byte ASCII header to each payload —
    ``magic`` (4 bytes) + zero-padded 4-hex-digit width + 4-hex-digit
    height — mirroring how real container formats carry dimensions in
    their leading bytes (PNG IHDR, BMP DIB, WAV fmt). Width/height are
    derived from ``media_id`` (16 + id·{1,7} mod 240), so the header is
    reproducible from the row alone and an external oracle can replay
    the exact byte arithmetic. The concat stays binary end to end; the
    metadata columns are set to the same values the header encodes so
    parse-vs-metadata agreement is checkable."""
    width = (F.lit(16) + F.pmod(F.abs(F.col("media_id")), F.lit(240))).cast("int")
    height = (F.lit(16) + F.pmod(F.abs(F.col("media_id") * 7), F.lit(240))).cast("int")
    header = F.concat(
        F.lit(magic),
        F.lpad(F.hex(width), 4, "0"),
        F.lpad(F.hex(height), 4, "0"),
    )
    return (
        media.withColumn("width", width)
        .withColumn("height", height)
        .withColumn("payload", F.concat(F.encode(header, "UTF-8"), F.col("payload")))
    )


def parse_media_header(media: DataFrame) -> DataFrame:
    """Parse magic bytes + dimensions straight off the BINARY payload
    column with native column algebra (substring slices the binary,
    decode/conv turn the hex digits into ints) — NO UDF, so the parse
    rides whole-stage codegen and the payload body is never touched
    (Parquet reads only the leading bytes' column pages it needs).
    Output: (media_id, magic, width, height, body_bytes, aspect);
    ``aspect`` is a single int/int division (bit-identical across
    engines). This is the value-oracled face of the decode step: the
    header IS decoded, byte for byte; only pixel/sample decode beyond
    the header remains stubbed (no media libs in the container)."""
    b = F.col("payload")
    width = F.conv(F.decode(F.substring(b, 5, 4), "UTF-8"), 16, 10).cast("int")
    height = F.conv(F.decode(F.substring(b, 9, 4), "UTF-8"), 16, 10).cast("int")
    return media.select(
        "media_id",
        F.decode(F.substring(b, 1, 4), "UTF-8").alias("magic"),
        width.alias("width"),
        height.alias("height"),
        (F.octet_length(b) - F.lit(HEADER_BYTES)).cast("long").alias("body_bytes"),
        (width.cast("double") / height).alias("aspect"),
    )


def _fake_decode(payload: bytes, feat_dim: int) -> list[float]:
    # Deterministic fake "pixel features": byte histogram moments.
    if payload is None or len(payload) == 0:
        return [0.0] * feat_dim
    arr = memoryview(payload)
    return [sum(arr[i::feat_dim]) / max(1, len(arr[i::feat_dim])) / 255.0 for i in range(feat_dim)]


def extract_features(media: DataFrame, feat_dim: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``. Real decode is
    stubbed; ``fake=True`` runs the deterministic byte-level fake so the
    distributed plumbing is fully testable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "real image/audio decode requires Pillow/torchaudio — not in this container; "
                "use fake=True for the deterministic test decoder"
            )
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: _fake_decode(p, feat_dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "feat_mean": feats.map(lambda v: float(sum(v) / len(v))),
                    "feat_dim": feat_dim,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit (media_id, frame_idx) rows for
    frames 0, n, 2n, ... based on payload length as a stand-in duration.
    Real frame extraction would replace the sequence with a decoder."""
    n_frames = (F.length("payload") / 100 + 1).cast("int")
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
