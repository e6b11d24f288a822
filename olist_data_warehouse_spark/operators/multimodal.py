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
container, so every kernel gates real codecs behind a clearly-marked
``NotImplementedError`` and ships a deterministic ``fake`` codec that
parses our own fake header formats. The Spark-side plumbing — schema,
Arrow batching, one-to-many frame fan-out, partitioning — is real and
tested for all four pipeline stages (decode / feature-extract / resize
/ frame-sample).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic fake payload formats, so plumbing is testable without
# codec libs: b"FAKEIMG|<width>|<height>|<channels>|" + pixel bytes;
# b"FAKEVID|<n_frames>|<width>|<height>|" + frame bytes.
FAKE_MAGIC = b"FAKEIMG"
FAKE_VIDEO_MAGIC = b"FAKEVID"

DECODED_META_SCHEMA = (
    "item_id bigint, byte_len int, is_valid boolean, "
    "width int, height int, channels int"
)
FEATURES_SCHEMA = "item_id bigint, features array<double>"
RESIZED_SCHEMA = "item_id bigint, payload binary"
FRAMES_SCHEMA = "item_id bigint, frame_idx int, width int, height int"


def make_fake_image(item_id: int, width: int, height: int, channels: int = 3) -> bytes:
    header = b"|".join(
        [FAKE_MAGIC, str(width).encode(), str(height).encode(), str(channels).encode()]
    ) + b"|"
    # deterministic pixel bytes from the id
    n = width * height * channels
    body = bytes((item_id * 31 + i) % 256 for i in range(min(n, 64)))
    return header + body


def make_fake_video(item_id: int, n_frames: int, width: int, height: int) -> bytes:
    header = b"|".join(
        [FAKE_VIDEO_MAGIC, str(n_frames).encode(), str(width).encode(),
         str(height).encode()]
    ) + b"|"
    body = bytes((item_id * 17 + i) % 256 for i in range(min(n_frames * 4, 64)))
    return header + body


def _parse_image_header(b) -> tuple[bool, int, int, int, bytes]:
    """(is_valid, width, height, channels, body) from a fake payload."""
    if b is None or not bytes(b).startswith(FAKE_MAGIC):
        return (False, 0, 0, 0, b"")
    parts = bytes(b).split(b"|", 4)
    try:
        return (True, int(parts[1]), int(parts[2]), int(parts[3]), parts[4])
    except (IndexError, ValueError):
        return (False, 0, 0, 0, b"")


def _gate(codec: str, stage: str, needs: str) -> None:
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: {stage} requires {needs}, not available in "
            "this environment; only the deterministic 'fake' codec is wired."
        )


def decode_image_meta(images: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stage: binary payload → typed metadata rows.

    ``images`` needs (item_id bigint, payload binary). Real codecs are
    unavailable here (NotImplementedError); the 'fake' codec exercises
    the identical mapInPandas plumbing: Arrow batches in, explicit
    schema out, no row-at-a-time Python.
    """
    _gate(codec, "image decode", "an image library (PIL/opencv)")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "item_id": pdf["item_id"],
                "byte_len": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0
                ),
            }
            parsed = pdf["payload"].map(_parse_image_header)
            out["is_valid"] = parsed.map(lambda t: t[0])
            out["width"] = parsed.map(lambda t: t[1])
            out["height"] = parsed.map(lambda t: t[2])
            out["channels"] = parsed.map(lambda t: t[3])
            yield pd.DataFrame(out)

    return images.mapInPandas(decode, schema=DECODED_META_SCHEMA)


def extract_features(images: DataFrame, codec: str = "fake") -> DataFrame:
    """Feature-extract stage: binary payload → embedding column.

    A real pipeline runs a vision model per Arrow batch here; the fake
    codec derives a deterministic 5-dim descriptor from the decoded
    header (width, height, channels, byte_len, aspect ratio) so the
    batch shape and ``array<double>`` schema are exercised end to end.
    Invalid payloads get a NULL feature vector (downstream filters on
    it, mirroring a decode-failure route).
    """
    _gate(codec, "feature extraction", "a vision model runtime")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                ok, w, h, c, _body = _parse_image_header(b)
                if not ok or h == 0:
                    feats.append(None)
                else:
                    feats.append(
                        [float(w), float(h), float(c), float(len(bytes(b))), w / h]
                    )
            yield pd.DataFrame({"item_id": pdf["item_id"], "features": feats})

    return images.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def resize_images(
    images: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize stage: binary in → binary out with updated metadata.

    Fake-codec semantics (deterministic, re-derivable by the oracle):
    the header is rewritten with the target dimensions (channels kept)
    and the pixel body is truncated to at most width*height*channels
    bytes. Invalid payloads pass through unchanged — a real pipeline
    routes them to a dead-letter sink instead of crashing the stage.
    """
    _gate(codec, "resize", "an image library (PIL/opencv)")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        def resize(b):
            ok, _w, _h, c, body = _parse_image_header(b)
            if not ok:
                return b
            header = b"|".join(
                [FAKE_MAGIC, str(width).encode(), str(height).encode(),
                 str(c).encode()]
            ) + b"|"
            return header + body[: width * height * c]

        for pdf in batches:
            yield pd.DataFrame(
                {"item_id": pdf["item_id"], "payload": pdf["payload"].map(resize)}
            )

    return images.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_frames(videos: DataFrame, every_n: int, codec: str = "fake") -> DataFrame:
    """Video frame-sampling stage: one payload row → many frame rows.

    Exercises the one-to-many ``mapInPandas`` fan-out a real ffmpeg
    stage needs: each valid FAKEVID payload emits a row per sampled
    frame index (0, every_n, 2·every_n, … < n_frames) with the frame
    dimensions; invalid payloads emit nothing (dead-letter route).
    """
    _gate(codec, "frame sampling", "ffmpeg bindings")
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, ws, hs = [], [], [], []
            for item_id, b in zip(pdf["item_id"], pdf["payload"]):
                if b is None or not bytes(b).startswith(FAKE_VIDEO_MAGIC):
                    continue
                parts = bytes(b).split(b"|", 4)
                try:
                    n_frames, w, h = int(parts[1]), int(parts[2]), int(parts[3])
                except (IndexError, ValueError):
                    continue
                for f in range(0, n_frames, every_n):
                    ids.append(item_id)
                    idxs.append(f)
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {"item_id": ids, "frame_idx": idxs, "width": ws, "height": hs}
            )

    return videos.mapInPandas(kernel, schema=FRAMES_SCHEMA)


def shard_for_decode(
    images: DataFrame, n_shards: int | None = None
) -> DataFrame:
    """Repartition payload rows by id-hash shard so decode tasks are
    uniform under payload-size skew (the expensive stage at scale).

    ``n_shards=None`` (default) sizes the shard count from the INPUT,
    one shard per upstream partition (floor 4): the reshard exists to
    change the KEY (id-hash, for payload-size uniformity), not to
    multiply task count. Shard count must scale with data, not be a
    constant — a 100 TB payload table arrives in thousands of input
    partitions and fans out to as many decode tasks, while a small
    table spawns only a handful of Python workers (a fixed constant
    over-shards small inputs into pure task/worker-spawn overhead).
    Measured at sf0.1 (BENCH_DRIFT.md r13): 4× multiplication made
    the stage ~3x slower (128 shards of 39 rows); 1:1 matches the
    r11/r12 records."""
    if n_shards is None:
        n_shards = max(4, images.rdd.getNumPartitions())
    return images.repartition(n_shards, F.pmod(F.hash("item_id"), F.lit(n_shards)))


# Fake audio payload: b"FAKEAUD|<sample_rate>|<n_samples>|<channels>|" + pcm
FAKE_AUDIO_MAGIC = b"FAKEAUD"

AUDIO_META_SCHEMA = (
    "item_id bigint, byte_len int, is_valid boolean, "
    "sample_rate int, n_samples int, channels int, duration_ms bigint"
)


def make_fake_audio(
    item_id: int, sample_rate: int, n_samples: int, channels: int = 1
) -> bytes:
    header = b"|".join(
        [FAKE_AUDIO_MAGIC, str(sample_rate).encode(), str(n_samples).encode(),
         str(channels).encode()]
    ) + b"|"
    body = bytes((item_id * 13 + i) % 256 for i in range(min(n_samples, 64)))
    return header + body


def decode_audio_meta(audio: DataFrame, codec: str = "fake") -> DataFrame:
    """Audio decode stage: payload → (sample_rate, n_samples,
    channels, duration_ms). Same Arrow-batched mapInPandas contract as
    the image/video stages; a real pipeline puts soundfile/torchaudio
    in this slot. duration_ms is integer math (n_samples·1000 //
    rate): engine-portable."""
    _gate(codec, "audio decode", "an audio library (soundfile/torchaudio)")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        def parse(b):
            if b is None:
                return (0, False, 0, 0, 0, 0)
            bb = bytes(b)
            if not bb.startswith(FAKE_AUDIO_MAGIC):
                return (len(bb), False, 0, 0, 0, 0)
            parts = bb.split(b"|", 4)
            try:
                rate, n, ch = int(parts[1]), int(parts[2]), int(parts[3])
            except (IndexError, ValueError):
                return (len(bb), False, 0, 0, 0, 0)
            dur = n * 1000 // rate if rate > 0 else 0
            return (len(bb), True, rate, n, ch, dur)

        for pdf in batches:
            parsed = pdf["payload"].map(parse)
            yield pd.DataFrame({
                "item_id": pdf["item_id"],
                "byte_len": parsed.map(lambda t: t[0]),
                "is_valid": parsed.map(lambda t: t[1]),
                "sample_rate": parsed.map(lambda t: t[2]),
                "n_samples": parsed.map(lambda t: t[3]),
                "channels": parsed.map(lambda t: t[4]),
                "duration_ms": parsed.map(lambda t: t[5]),
            })

    return audio.mapInPandas(kernel, schema=AUDIO_META_SCHEMA)


PHASH_SCHEMA = "item_id bigint, phash bigint"


def image_phash(images: DataFrame, codec: str = "fake") -> DataFrame:
    """Perceptual-hash stage: binary payload → 48-bit average-hash.

    aHash over the decoded pixel bytes (first 48 of the body): bit i is
    set iff pixel i is STRICTLY above the mean, with the mean compare
    cross-multiplied to the pure-integer predicate b[i]*n > sum(b) — no
    float mean, so the hash is bit-identical under any arithmetic. 48
    bits keeps the value positive in a signed BIGINT. Near-identical
    images (here: payloads whose bodies share bytes) collapse to the
    same hash — the image-dedup primitive; real pipelines swap the
    fake parser for PIL + a 8x8 grayscale resize and keep this exact
    bit rule. Arrow-batched mapInPandas like every multimodal stage:
    bytes cross JVM↔Python once per batch.
    """
    _gate(codec, "image phash", "an image library (PIL/opencv)")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(b) -> int:
            valid, _w, _h, _c, body = _parse_image_header(b)
            if not valid:
                return 0
            bs = bytes(body)[:48]
            n = len(bs)
            if n == 0:
                return 0
            tot = sum(bs)
            h = 0
            for i, v in enumerate(bs):
                if v * n > tot:
                    h |= 1 << i
            return h

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "phash": pdf["payload"].map(one),
                }
            )

    return images.mapInPandas(kernel, schema=PHASH_SCHEMA)
