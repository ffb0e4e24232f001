"""Multimodal plumbing tests: the decode kernels are stubbed (no codecs in
this container) but schemas, partitioning, batch shapes and determinism
are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_lightning_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, f"img_{i}".encode() * 10) for i in range(20)]
    return spark.createDataFrame(rows, "media_id long, content binary").repartition(4)


def test_image_metadata_schema_and_determinism(spark, media_df):
    out = MM.image_metadata(media_df)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "content", "width", "height", "mime",
    ]
    a = {r["media_id"]: (r["width"], r["height"]) for r in out.collect()}
    b = {r["media_id"]: (r["width"], r["height"]) for r in out.collect()}
    assert a == b  # deterministic across runs
    assert all(64 <= w < 2048 and 64 <= h < 2048 for w, h in a.values())


def test_resize_roundtrip_schema(spark, media_df):
    out = MM.resize_images(media_df, 224, 224)
    assert out.schema == media_df.schema
    payloads = [bytes(r["content"]) for r in out.collect()]
    assert all(p[-2:] == bytes([224, 224]) for p in payloads)


def test_image_embedding_feeds_knn(spark, media_df):
    emb = MM.image_embedding(media_df, dim=8)
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    # plumb into the LSH ANN operator (the multimodal near-dup path)
    from tidb_lightning_spark.functions.similarity import knn_lsh

    res = knn_lsh(
        emb, "media_id", "embedding", lambda c: c < 3, dim=8, k=3, n_planes=4
    )
    rows = res.collect()
    assert {r["query_id"] for r in rows} <= {0, 1, 2}
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)


def test_video_frame_fanout(spark, media_df):
    out = MM.sample_video_frames(media_df, every_ms=1000)
    rows = out.collect()
    assert len(rows) > len(media_df.collect())  # fan-out happened
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indexes


def test_real_decode_raises(spark, media_df):
    with pytest.raises(Exception) as ei:
        MM.image_metadata(media_df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)
