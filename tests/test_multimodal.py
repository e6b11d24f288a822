"""Multimodal plumbing: schema, Arrow batching, and stub gating are
real even though codecs are stubbed (task contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, mm.make_fake_image(1, 64, 48)),
        (2, mm.make_fake_image(2, 128, 96, channels=1)),
        (3, b"not an image"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "item_id bigint, payload binary")


def test_decode_fake_codec_metadata(spark, images):
    got = {r.item_id: r for r in mm.decode_image_meta(images).collect()}
    assert got[1].is_valid and (got[1].width, got[1].height, got[1].channels) == (64, 48, 3)
    assert got[2].is_valid and got[2].channels == 1
    assert not got[3].is_valid
    assert not got[4].is_valid and got[4].byte_len == 0


def test_decode_schema_is_typed(spark, images):
    df = mm.decode_image_meta(images)
    assert df.schema.simpleString() == (
        "struct<item_id:bigint,byte_len:int,is_valid:boolean,"
        "width:int,height:int,channels:int>"
    )


def test_real_codecs_are_gated(spark, images):
    with pytest.raises(NotImplementedError):
        mm.decode_image_meta(images, codec="pil")
    with pytest.raises(NotImplementedError):
        mm.extract_features(images, codec="resnet")
    with pytest.raises(NotImplementedError):
        mm.resize_images(images, 32, 32, codec="pil")
    with pytest.raises(NotImplementedError):
        mm.sample_frames(images, 10, codec="ffmpeg")


def test_extract_features_fake_descriptor(spark, images):
    got = {r.item_id: r.features for r in mm.extract_features(images).collect()}
    img1 = mm.make_fake_image(1, 64, 48)
    assert got[1] == [64.0, 48.0, 3.0, float(len(img1)), 64 / 48]
    assert got[3] is None and got[4] is None  # invalid → NULL route


def test_resize_rewrites_header_and_truncates_body(spark, images):
    resized = mm.resize_images(images, 4, 4)
    meta = {r.item_id: r for r in mm.decode_image_meta(resized).collect()}
    assert (meta[1].width, meta[1].height, meta[1].channels) == (4, 4, 3)
    # body capped at 4*4*3 = 48 < the original 64 body bytes
    header = len(b"FAKEIMG|4|4|3|")
    assert meta[1].byte_len == header + 48
    # channels preserved from the source payload (item 2 is 1-channel)
    assert meta[2].channels == 1
    # invalid payloads pass through unchanged
    raw = {r.item_id: r.payload for r in resized.collect()}
    assert bytes(raw[3]) == b"not an image" and raw[4] is None


def test_sample_frames_fan_out(spark):
    rows = [
        (1, mm.make_fake_video(1, 7, 32, 24)),
        (2, mm.make_fake_video(2, 1, 16, 16)),
        (3, b"junk"),
        (4, None),
    ]
    videos = spark.createDataFrame(rows, "item_id bigint, payload binary")
    got = mm.sample_frames(videos, every_n=3).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.item_id, []).append((r.frame_idx, r.width, r.height))
    assert sorted(by_id[1]) == [(0, 32, 24), (3, 32, 24), (6, 32, 24)]
    assert by_id[2] == [(0, 16, 16)]
    assert 3 not in by_id and 4 not in by_id  # invalid rows emit nothing
    with pytest.raises(ValueError):
        mm.sample_frames(videos, every_n=0)


def test_shard_for_decode_partitioning(spark, images):
    sharded = mm.shard_for_decode(images, n_shards=4)
    assert sharded.rdd.getNumPartitions() == 4
    # payload content unchanged by the repartition
    assert sharded.count() == images.count()


def test_shard_for_decode_default_sizes_from_input(spark, images):
    """Default shard count scales with the INPUT (1:1 per upstream
    partition, floor 4) — a fixed constant over-shards small inputs
    into task overhead and under-shards 100 TB ones."""
    one = images.coalesce(1)
    assert mm.shard_for_decode(one).rdd.getNumPartitions() == 4
    wide = images.repartition(12)
    assert mm.shard_for_decode(wide).rdd.getNumPartitions() == 12
    assert mm.shard_for_decode(one).count() == images.count()


def test_decode_audio_meta(spark):
    rows = [
        (1, mm.make_fake_audio(1, 16000, 32000)),           # 2.0 s mono
        (2, mm.make_fake_audio(2, 44100, 44100, channels=2)),
        (3, b"static noise"),
        (4, None),
    ]
    audio = spark.createDataFrame(rows, "item_id bigint, payload binary")
    got = {r.item_id: r for r in mm.decode_audio_meta(audio).collect()}
    assert got[1].is_valid and got[1].sample_rate == 16000
    assert got[1].duration_ms == 2000
    assert got[2].channels == 2 and got[2].duration_ms == 1000
    assert not got[3].is_valid and not got[4].is_valid
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        mm.decode_audio_meta(audio, codec="torchaudio")
