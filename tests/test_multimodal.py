"""Multimodal plumbing tests: binary columns, typed metadata, and the
Arrow-batched decode path (stub codec, real Spark machinery)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_de_final_project_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return multimodal.synthesize_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "doc_id",
        "kind",
        "payload",
        "meta",
    ]
    meta_type = media.schema["meta"].dataType
    assert [f.name for f in meta_type.fields] == ["mime", "width", "height"]


def test_decode_is_deterministic_and_batched(media):
    d1 = {r.media_id: (r.width, r.height, tuple(r.feature))
          for r in multimodal.decode_media(media).collect()}
    d2 = {r.media_id: (r.width, r.height, tuple(r.feature))
          for r in multimodal.decode_media(media.repartition(7)).collect()}
    assert d1 == d2  # partitioning/batching must not change results
    w, h, feat = next(iter(d1.values()))
    assert 0 <= w < 1920 and 0 <= h < 1080 and len(feat) == 8
    assert all(0.0 <= f <= 1.0 for f in feat)


def test_byte_stats_no_decode(media):
    stats = {r.kind: r for r in multimodal.media_byte_stats(media).collect()}
    assert set(stats) == {"image", "audio"}
    total_rows = sum(r.n_media for r in stats.values())
    assert total_rows == media.count()
    for r in stats.values():
        assert r.min_bytes <= r.max_bytes <= r.total_bytes


def test_resize_stub(media):
    resized = multimodal.resize_media(media, width=224, height=224)
    rows = resized.collect()
    assert len(rows) == media.count()
    budget = 224 * 224 // 64
    for r in rows:
        if r.kind == "image":
            assert (r.width, r.height) == (224, 224)
            assert len(r.payload) <= budget
            assert r.orig_bytes >= len(r.payload)
        else:  # non-image passes through untouched
            assert len(r.payload) == r.orig_bytes


def test_frame_sample_fanout(media):
    frames = multimodal.sample_frames(media, frame_bytes=64, every_n=4)
    per_media = {
        r.media_id: r.n_frames
        for r in frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .collect()
    }
    sizes = {r.media_id: r for r in media.select(
        "media_id", F.octet_length("payload").alias("nb")).collect()}
    assert set(per_media) <= set(sizes)
    for mid, n in per_media.items():
        n_frames = max(1, sizes[mid].nb // 64)
        expected = len(range(0, n_frames, 4))
        assert n == expected
    # frame indices step by every_n and slices are bounded
    for r in frames.filter(F.col("media_id") == min(per_media)).collect():
        assert r.frame_idx % 4 == 0
        assert r.n_bytes <= 64


def test_codec_gate_absent_falls_back_to_stub(media):
    """This container has no PIL/soundfile, so the import-try registry
    is empty and codec='auto' must equal codec='stub' exactly."""
    assert multimodal.available_codecs() == {}
    auto = {r.media_id: (r.width, r.height, tuple(r.feature))
            for r in multimodal.decode_media(media, codec="auto").collect()}
    stub = {r.media_id: (r.width, r.height, tuple(r.feature))
            for r in multimodal.decode_media(media, codec="stub").collect()}
    assert auto == stub

    with pytest.raises(ValueError):
        multimodal.decode_media(media, codec="jpeg")


def test_codec_gate_routing_unit():
    """Routing contract of the import-try gate, tested at the function
    level (worker processes probe their own registry, so driver-side
    monkeypatching cannot reach a forked worker — by design):
    real decoder wins for its kind, reject-errors yield the (0, 0, [])
    sentinel (never stub features masquerading as real), unregistered
    kinds fall back to the stub."""

    def fake_image_codec(payload: bytes):
        if len(payload) % 7 == 0:
            raise ValueError("corrupt")
        return (123, 456, [float(len(payload) % 10)] * 8)

    codecs = {"image": fake_image_codec}
    ok = multimodal._decode_with_codecs(codecs, "image", b"x" * 8)
    assert ok == (123, 456, [8.0] * 8)
    bad = multimodal._decode_with_codecs(codecs, "image", b"x" * 7)
    assert bad == (0, 0, [])
    audio = multimodal._decode_with_codecs(codecs, "audio", b"x" * 8)
    assert audio == multimodal._decode_payload("audio", b"x" * 8)
    assert multimodal._decode_with_codecs(codecs, "image", None) == (
        multimodal._decode_payload("image", None)
    )
