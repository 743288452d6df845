"""Multimodal-column tests: fake-container decode, resize, frame
sampling, audio features — Spark-side plumbing (schemas, batch shapes,
explode layout) is real; codecs are the documented stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from virapipe_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", mm.pack_media("i", bytes(range(100)) * 4, width=20, height=20),
         20, 20, 0, 0),
        (2, "image", mm.pack_media("i", b"", width=0, height=0), 0, 0, 0, 0),
        (3, "audio", mm.pack_media("a", bytes([5, 250] * 600), sample_rate=16000,
                                   duration_ms=75), 0, 0, 16000, 75),
        (4, "video", mm.pack_media("v", bytes(range(256)) * 8, width=64, height=48,
                                   duration_ms=5500), 64, 48, 0, 5500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).cache()


def test_container_roundtrip():
    blob = mm.pack_media("i", b"abc", width=3, height=1)
    kind, w, h, rate, dur, payload = mm._unpack(blob)
    assert (kind, w, h, payload) == ("image", 3, 1, b"abc")


def test_require_codecs_raises():
    with pytest.raises(NotImplementedError):
        mm.require_codecs()


def test_image_features(media):
    feats = mm.decode_image_features(media)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "width", "height", "n_bytes", "mean_intensity", "std_intensity"
    ]
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}  # only images reach the UDF
    assert rows[1]["n_bytes"] == 400
    assert rows[1]["mean_intensity"] == pytest.approx(49.5)
    assert rows[2]["mean_intensity"] == 0.0  # empty payload handled


def test_resize_fixed_shape(media):
    resized = mm.resize_images(media, 8, 8)
    rows = {r["media_id"]: r for r in resized.collect()}
    assert all(len(r["data"]) == 64 for r in rows.values())
    assert rows[1]["width"] == 8 and rows[1]["height"] == 8
    # deterministic: same input -> same bytes
    again = {r["media_id"]: r for r in mm.resize_images(media, 8, 8).collect()}
    assert bytes(again[1]["data"]) == bytes(rows[1]["data"])


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=1000)
    rows = frames.orderBy("frame_idx").collect()
    assert [r["media_id"] for r in rows] == [4] * 5  # 5500ms @ 1s -> 5 frames
    assert [r["t_ms"] for r in rows] == [0, 1000, 2000, 3000, 4000]
    assert len({r["frame_hash"] for r in rows}) == 5  # distinct frame content


def test_audio_features(media):
    feats = mm.audio_features(media, window=256)
    r = feats.first()
    assert r["media_id"] == 3 and r["sample_rate"] == 16000
    assert r["n_windows"] == 1200 // 256
    assert len(r["rms_energy"]) == r["n_windows"]
    assert all(v > 0 for v in r["rms_energy"])


def test_metadata_pruning_before_udf(media):
    """Metadata-only predicates never touch payloads: plan for a
    metadata filter+count reads no binary column."""
    q = media.filter(F.col("kind") == "audio").select("media_id", "duration_ms")
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "data" not in plan.split("Filter")[0]  # projection pruned payload
