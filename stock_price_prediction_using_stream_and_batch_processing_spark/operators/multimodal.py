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
