"""Multimodal mapInPandas plumbing: schemas, batch iteration, frame fan-out."""

import hashlib

from csv_loader_spark.ops.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_media,
    extract_features,
    sample_frames,
)


def _docs(spark):
    rows = [(i, "word " * (i + 1) + "end") for i in range(9)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shape(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_media_schema_and_features(spark):
    media = attach_fake_media(_docs(spark))
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)
    feats = extract_features(media)
    assert _shape(feats.schema) == _shape(FEATURE_SCHEMA)
    got = {r["doc_id"]: r for r in feats.collect()}
    assert len(got) == 9
    payload = ("word " * 3 + "end").encode()
    r2 = got[2]
    assert r2["media_type"] == "video"  # 2 % 3 == 2
    assert r2["n_bytes"] == len(payload)
    assert r2["content_sha256"] == hashlib.sha256(payload).hexdigest()
    assert abs(r2["mean_byte"] - sum(payload) / len(payload)) < 1e-3
    assert (r2["decoded_width"], r2["decoded_height"]) == (2 + 16, 2 + 16)


def test_frame_sampling_fanout(spark):
    media = attach_fake_media(
        spark.createDataFrame([(2, "x" * 700)], "doc_id long, text string")
    )  # doc_id 2 → video; 700 bytes → 10 full 64-byte frames → keep 0,4,8
    frames = sample_frames(media, frame_size=64, every_n=4)
    assert _shape(frames.schema) == _shape(FRAME_SCHEMA)
    rows = sorted(frames.collect(), key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in rows] == [0, 4, 8]
    assert all(len(r["frame_bytes"]) == 64 for r in rows)


def test_non_video_produces_no_frames(spark):
    media = attach_fake_media(
        spark.createDataFrame([(0, "y" * 700)], "doc_id long, text string")
    )  # doc_id 0 → image
    assert sample_frames(media).count() == 0
