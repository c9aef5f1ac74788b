"""Multimodal plumbing tests: schema, mapInPandas batch shape,
deterministic fake decode, frame-sample fan-out."""

from __future__ import annotations

import hashlib

from cherry_spark.ext.multimodal import (
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_plan,
)


def _media_rows(n=20):
    rows = []
    for i in range(n):
        payload = (
            (640 + i).to_bytes(4, "big")
            + (480 + i).to_bytes(4, "big")
            + hashlib.sha256(f"img{i}".encode()).digest()
        )
        kind = "video" if i % 4 == 0 else "image"
        rows.append((i, kind, payload, ("image/png", len(payload) * 1024, f"s{i}")))
    return rows


def test_decode_image_features(spark):
    df = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    feats = decode_image_features(df).orderBy("media_id").collect()
    assert len(feats) == 20
    r0 = feats[0]
    assert (r0["width"], r0["height"], r0["channels"]) == (640, 480, 3)
    assert len(r0["feature"]) == 8
    # deterministic: same payload -> same feature
    payload0 = bytes(_media_rows()[0][2])
    expected0 = hashlib.sha256(payload0).digest()[0] / 255.0
    assert abs(r0["feature"][0] - expected0) < 1e-6


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    frames = frame_sample_plan(df, every_nth=10).collect()
    assert all(r["frame_index"] % 10 == 0 for r in frames)
    vids = {r["media_id"] for r in frames}
    assert vids == {0, 4, 8, 12, 16}
    # fan-out: multiple frames per video
    per_vid = [r for r in frames if r["media_id"] == 0]
    assert len(per_vid) > 1
