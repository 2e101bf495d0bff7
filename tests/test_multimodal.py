"""Multimodal plumbing tests: binary payload columns + mapInPandas
feature extraction (north-star extension; decode itself is stubbed —
operators/multimodal.py). The Spark-side contract (schema, Arrow batch
shape, column pruning) is what's under test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators.multimodal import (
    _fake_decode,
    extract_features,
    frame_sample_plan,
    to_media_table,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    return to_media_table(docs, "doc_id", "text", kind="image")


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "kind": "string",
        "payload": "binary",
        "width": "int",
        "height": "int",
        "sample_rate": "int",
    }


def test_extract_features_matches_local_decode(spark, media):
    feats = extract_features(media, feat_dim=8).collect()
    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert len(feats) == len(raw) > 0
    for r in feats:
        payload = raw[r.media_id]
        want = _fake_decode(payload, 8)
        assert r.n_bytes == len(payload)
        assert r.feat_mean == pytest.approx(sum(want) / len(want), rel=1e-12)
        assert r.feat_dim == 8
        assert r.kind == "image"


def test_real_decode_is_explicitly_stubbed(media):
    with pytest.raises(Exception) as ei:
        extract_features(media.limit(1), fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_metadata_projection_prunes_payload(media):
    # Parquet/columnar contract: a metadata-only projection must not
    # carry the payload column through the plan.
    plan = media.select("media_id", "kind").queryExecution if False else None
    explained = media.select("media_id", "kind")._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in explained


def test_frame_sample_plan(spark):
    rows = [(1, b"x" * 950), (2, b"y" * 90)]
    df = spark.createDataFrame(rows, "media_id long, payload binary").withColumn(
        "kind", F.lit("video")
    )
    out = frame_sample_plan(df, every_n=4).collect()
    # media 1: ceil-ish (950/100 + 1)=10 frames -> idx 0,4,8; media 2: 1 frame -> idx 0
    got = {(r.media_id, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 4), (1, 8), (2, 0)}


def test_media_header_roundtrip(spark):
    """add_media_header -> parse_media_header recovers exactly what the
    header encodes: magic, the width/height written into the metadata
    columns, the original payload's byte count, and the single-division
    aspect — all via native binary column algebra (no UDF)."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.multimodal import (
        add_media_header,
        parse_media_header,
        to_media_table,
    )

    rows = [(7, "héllo wörld"), (250, "x" * 300), (0, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = add_media_header(to_media_table(docs, "doc_id", "text"))
    meta = {r.media_id: (r.width, r.height) for r in media.select("media_id", "width", "height").collect()}
    out = {r.media_id: r for r in parse_media_header(media).collect()}
    raw_bytes = {i: len(t.encode("utf-8")) for i, t in rows}
    for mid, (w, h) in meta.items():
        r = out[mid]
        assert r.magic == "IMG1"
        assert (r.width, r.height) == (w, h) == (16 + mid % 240, 16 + (mid * 7) % 240)
        assert r.body_bytes == raw_bytes[mid]  # multibyte text counted in BYTES
        assert r.aspect == w / h
