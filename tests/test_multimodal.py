"""Multimodal plumbing tests: binary schema, Arrow batch shapes,
deterministic fake decode, frame-sample explode, and a custom decoder
slot (the real-codec path, stubbed)."""

import os

import pytest
from pyspark.sql import functions as F

from rust_diskann_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return mm.synthesize_blobs(docs.limit(50), "image").persist()


def test_blob_schema_is_binary(blobs):
    assert dict(blobs.dtypes)["content"] == "binary"


def test_decode_features_deterministic(blobs):
    a = mm.decode_image_features(blobs).orderBy("id").collect()
    b = mm.decode_image_features(blobs).orderBy("id").collect()
    assert a == b
    for r in a:
        assert 1 <= r["width"] <= mm.MAX_W
        assert 1 <= r["height"] <= mm.MAX_H
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["features"])
        assert len(r["content_hash"]) == 32


def test_decode_matches_local_md5(blobs):
    import hashlib

    rows = blobs.select("id", "content").orderBy("id").limit(5).collect()
    feats = {r["id"]: r for r in mm.decode_image_features(blobs).collect()}
    for r in rows:
        assert feats[r["id"]]["content_hash"] == hashlib.md5(bytes(r["content"])).hexdigest()
        assert feats[r["id"]]["n_bytes"] == len(r["content"])


def test_resize_geometry(blobs):
    out = mm.resize_images(blobs, 512, 512).collect()
    for r in out:
        assert max(r["out_w"], r["out_h"]) <= 512
        # aspect preserved to integer floor
        assert r["out_w"] == int(r["width"] * r["scale"])
        assert r["out_h"] == int(r["height"] * r["scale"])


def test_frame_sample_explode(blobs):
    frames = mm.sample_frames(blobs, every_n=4)
    rows = frames.collect()
    per_id = {}
    for r in rows:
        per_id.setdefault(r["id"], []).append(r["frame_idx"])
    feats = {r["id"]: r for r in mm.decode_image_features(blobs).collect()}
    for i, idxs in per_id.items():
        assert idxs == sorted(idxs)
        assert all(ix % 4 == 0 for ix in idxs)
        h = mm._h60(feats[i]["content_hash"])
        n_frames = 1 + h % mm.MAX_FRAMES
        assert len(idxs) == (n_frames + 3) // 4


def test_audio_stats_ranges(blobs):
    out = mm.audio_stats(blobs).collect()
    assert len(out) == 50
    for r in out:
        assert 1 <= r["duration_ms"] <= mm.MAX_DUR_MS
        assert r["sample_rate"] in (8000, 16000, 24000, 32000, 40000)


def test_custom_decoder_slot(blobs):
    """A real codec plugs in via decoder=; a decoder that raises
    NotImplementedError (the real-codec stub in this container)
    propagates cleanly."""

    def real_decoder(content: bytes) -> dict:
        raise NotImplementedError("PIL/ffmpeg not available in this container")

    with pytest.raises(Exception, match="NotImplementedError|not available"):
        mm.decode_image_features(blobs, decoder=real_decoder).collect()
