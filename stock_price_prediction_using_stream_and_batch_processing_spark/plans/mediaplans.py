"""Multimodal query corpus: opaque binary payload columns processed via
Arrow-batched ``mapInPandas`` (operators/multimodal.py). The documents
table's text bytes stand in for image/video payloads (no media libs in
the container — the decode step is a deterministic fake; the Spark-side
plumbing is real and oracle-checked where SQL can express it).

``media_feature_stats`` deliberately routes the ORACLE-CHECKED byte
counts through the mapInPandas UDF itself, so the differential check
covers the Arrow round trip (schema, batching, binary handling), not
just a native projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal
from ..sources.tables import load_table
from .core import register


def _media(spark, sf_dir, kind="image"):
    return multimodal.to_media_table(load_table(spark, sf_dir, "documents"), "doc_id", "text", kind=kind)


@register(
    "media_feature_stats",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS kind,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    tags=("multimodal", "binary", "mapinpandas"),
    driver=False,
)
def media_feature_stats(spark, sf_dir):
    """Byte-level stats computed INSIDE the mapInPandas feature
    extractor over the binary payload column — oracle-checks the whole
    Arrow/binary path end to end."""
    feats = multimodal.extract_features(_media(spark, sf_dir), feat_dim=8)
    return feats.select("media_id", "kind", "n_bytes")


@register(
    "media_feature_extract",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             'IMG1' || lpad(to_hex(16 + abs(doc_id) % 240), 4, '0')
                    || lpad(to_hex(16 + abs(doc_id * 7) % 240), 4, '0')
                    || text AS payload
      FROM documents
    ),
    p AS (
      SELECT doc_id AS media_id,
             substr(payload, 1, 4) AS magic,
             CAST(('0x' || substr(payload, 5, 4))::BIGINT AS INTEGER) AS width,
             CAST(('0x' || substr(payload, 9, 4))::BIGINT AS INTEGER) AS height,
             CAST(octet_length(encode(payload)) - 12 AS BIGINT) AS body_bytes
      FROM m
    )
    SELECT media_id, magic, width, height, body_bytes,
           CAST(width AS DOUBLE) / height AS aspect
    FROM p
    """,
    tags=("multimodal", "binary", "decode", "header-parse"),
    # rotation r9: driver-green r7+r8; byte-parse face proven
    driver=False,
)
def media_feature_extract(spark, sf_dir):
    """Media decode, value-oracled: payloads carry a deterministic
    12-byte binary header (magic + hex-encoded dimensions — the shape
    real containers use: PNG IHDR, BMP DIB, WAV fmt), and the query
    parses magic/width/height/body size straight off the BINARY column
    with native substring/decode/conv algebra — no UDF, whole-stage
    codegen end to end (operators/multimodal.add_media_header /
    parse_media_header). The DuckDB oracle replays the identical byte
    construction AND parse, so every decoded value is differentially
    checked. This retires the rows-only status this name carried
    through r6 (the fake byte-histogram decoder now lives only in
    media_feature_stats' Arrow-plumbing differential and the
    test_multimodal value pins); only pixel/sample decode beyond the
    header remains honestly stubbed (no media libs in the container)."""
    media = multimodal.add_media_header(_media(spark, sf_dir))
    return multimodal.parse_media_header(media)


@register(
    "media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(floor(octet_length(encode(text)) / 100.0 + 1) AS BIGINT), 10)) AS INTEGER) AS frame_idx
    FROM documents
    """,
    tags=("multimodal", "video", "explode"),
    driver=False,  # rotation r8: driver-green r7; slot went to stream_outer_join_purchase_error
)
def media_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: one row per sampled frame index,
    payload length as stand-in duration (operators/multimodal.py).
    Explode happens AFTER the metadata projection, so at scale the
    payload bytes never ride the exploded rows."""
    return multimodal.frame_sample_plan(_media(spark, sf_dir, kind="video"), every_n=10)
