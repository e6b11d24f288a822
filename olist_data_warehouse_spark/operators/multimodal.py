"""Multimodal column plumbing: binary payloads + typed metadata.

Design for image/audio/video at 100 TB:

- the payload is an opaque ``binary`` column; metadata (mime, width,
  sample rate, ...) travels in sibling typed columns so filters and
  joins never touch bytes (column pruning keeps scans narrow);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes cross the JVM↔Python boundary once per
  batch, not per row, and each stage declares an explicit output
  schema;
- partitioning: payload tables are written with small row groups and
  partitioned by content shard (hash of id) so a decode stage's tasks
  are uniformly sized regardless of file-size skew.

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are STUBS: ``decode_image_meta`` uses
a deterministic fake decoder (parses our own fake header format), and
``resize_images`` / ``sample_frames`` raise ``NotImplementedError``
unless the fake codec is requested. The Spark-side plumbing — schema,
batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic fake payload format, so plumbing is testable without
# codec libs: b"FAKEIMG|<width>|<height>|<channels>|" + pixel bytes.
FAKE_MAGIC = b"FAKEIMG"

DECODED_META_SCHEMA = (
    "item_id bigint, byte_len int, is_valid boolean, "
    "width int, height int, channels int"
)


def make_fake_image(item_id: int, width: int, height: int, channels: int = 3) -> bytes:
    header = b"|".join(
        [FAKE_MAGIC, str(width).encode(), str(height).encode(), str(channels).encode()]
    ) + b"|"
    # deterministic pixel bytes from the id
    n = width * height * channels
    body = bytes((item_id * 31 + i) % 256 for i in range(min(n, 64)))
    return header + body


def decode_image_meta(images: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stage: binary payload → typed metadata rows.

    ``images`` needs (item_id bigint, payload binary). Real codecs are
    unavailable here (NotImplementedError); the 'fake' codec exercises
    the identical mapInPandas plumbing: Arrow batches in, explicit
    schema out, no row-at-a-time Python.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: image libraries are not available in this "
            "environment; only the deterministic 'fake' codec is wired."
        )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "item_id": pdf["item_id"],
                "byte_len": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0
                ),
            }
            def parse(b):
                if b is None or not bytes(b).startswith(FAKE_MAGIC):
                    return (False, 0, 0, 0)
                parts = bytes(b).split(b"|", 4)
                try:
                    return (True, int(parts[1]), int(parts[2]), int(parts[3]))
                except (IndexError, ValueError):
                    return (False, 0, 0, 0)

            parsed = pdf["payload"].map(parse)
            out["is_valid"] = parsed.map(lambda t: t[0])
            out["width"] = parsed.map(lambda t: t[1])
            out["height"] = parsed.map(lambda t: t[2])
            out["channels"] = parsed.map(lambda t: t[3])
            yield pd.DataFrame(out)

    return images.mapInPandas(decode, schema=DECODED_META_SCHEMA)


def resize_images(images: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage (stub): requires a real image codec."""
    raise NotImplementedError(
        "resize requires an image library (PIL/opencv) not present in "
        "this environment; the pipeline slot is decode_image_meta-shaped "
        "(mapInPandas, binary in → binary out with updated metadata)."
    )


def sample_frames(videos: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling stage (stub): requires ffmpeg bindings."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg bindings not present in this "
        "environment; plumbing mirrors decode_image_meta (one binary "
        "row in → many frame rows out via mapInPandas)."
    )


def shard_for_decode(images: DataFrame, n_shards: int = 256) -> DataFrame:
    """Repartition payload rows by id-hash shard so decode tasks are
    uniform under payload-size skew (the expensive stage at scale)."""
    return images.repartition(n_shards, F.pmod(F.hash("item_id"), F.lit(n_shards)))
