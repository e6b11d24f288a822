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
        mm.resize_images(images, 32, 32)
    with pytest.raises(NotImplementedError):
        mm.sample_frames(images, 10)


def test_shard_for_decode_partitioning(spark, images):
    sharded = mm.shard_for_decode(images, n_shards=4)
    assert sharded.rdd.getNumPartitions() == 4
    # payload content unchanged by the repartition
    assert sharded.count() == images.count()
