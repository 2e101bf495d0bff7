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


# rotation r6: rows-only row banked in r5; media_frame_sample /
# media_feature_stats (full oracles) carry the multimodal driver slots
@register("media_feature_extract", oracle=None, tags=("multimodal", "binary", "mapinpandas"), driver=False)
def media_feature_extract(spark, sf_dir):
    """Full fake-decode feature extraction (deterministic byte-histogram
    moments — not SQL-expressible; rows-only check + exact value tests
    in tests/test_multimodal.py)."""
    return multimodal.extract_features(_media(spark, sf_dir), feat_dim=8)


@register(
    "media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(floor(octet_length(encode(text)) / 100.0 + 1) AS BIGINT), 10)) AS INTEGER) AS frame_idx
    FROM documents
    """,
    tags=("multimodal", "video", "explode"),
)
def media_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing: one row per sampled frame index,
    payload length as stand-in duration (operators/multimodal.py).
    Explode happens AFTER the metadata projection, so at scale the
    payload bytes never ride the exploded rows."""
    return multimodal.frame_sample_plan(_media(spark, sf_dir, kind="video"), every_n=10)
