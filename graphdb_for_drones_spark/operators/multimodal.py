"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition sizing) is
real and tested; the actual media decoding is STUBBED — the image/audio
libraries are not in this container.  ``decode=fake`` produces a
deterministic fake decode (dimensions/samples derived from the bytes) so
pipelines are testable end-to-end; ``decode=strict`` raises
NotImplementedError where a real Pillow/ffmpeg call would go.

Scale notes: media rows are large and skew-prone — the entry point
repartitions by a hash of the id so one executor never accumulates the
big-object tail, and batches flow through Arrow with
``maxRecordsPerBatch`` kept small (set
``spark.sql.execution.arrow.maxRecordsPerBatch`` ~64 for >MB blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("source", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("phash", LongType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic fake dimensions from the byte stream (stub for a
    real image decode)."""
    n = len(content)
    return (64 + n % 512, 64 + (n // 7) % 512)


def _real_image_features(b: bytes) -> tuple[int, int, int]:
    """Pillow decode + 64-bit average-hash (the classic aHash: 8x8
    grayscale downsample, bit = pixel > mean).  Raises
    NotImplementedError when Pillow is absent (this container)."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:  # pragma: no cover - Pillow absent here
        raise NotImplementedError(
            "decode='real' requires Pillow (pip install pillow); use "
            "decode='fake' in environments without it"
        ) from e
    img = Image.open(BytesIO(b))
    w, h = img.size
    small = img.convert("L").resize((8, 8))
    px = list(small.getdata())
    mean = sum(px) / 64
    bits = 0
    for i, v in enumerate(px):
        if v > mean:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return w, h, bits


def extract_image_features(
    media: DataFrame, decode: str = "fake"
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas.

    decode='fake': deterministic stand-in; decode='real': Pillow decode +
    average-hash (NotImplementedError when Pillow is absent);
    decode='strict': raise where the real decoder would run."""
    if decode not in ("fake", "strict", "real"):
        raise ValueError(decode)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "strict":
                raise NotImplementedError(
                    "real image decoding requires Pillow; not available "
                    "in this environment (use decode='fake')"
                )
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if decode == "real":
                    w, h, ph = _real_image_features(b)
                else:
                    w, h = _fake_decode(b)
                    # 64-bit perceptual-hash stand-in: stable byte hash
                    import hashlib

                    ph = int.from_bytes(
                        hashlib.blake2b(b, digest_size=8).digest(),
                        "big",
                        signed=True,
                    )
                rows.append((media_id, w, h, len(b), ph))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "phash"]
            )

    balanced = media.filter(F.col("kind") == "image").repartition(
        F.col("media_id")
    )
    return balanced.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx,
    frame_bytes) rows.  The 'frame' extraction is a deterministic byte
    slice (stub for an ffmpeg keyframe pull); the row-explosion shape —
    one input row fanning out to N output rows through mapInPandas — is
    the real thing."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    rows.append((media_id, i, b[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (
        media.filter(F.col("kind") == "video")
        .repartition(F.col("media_id"))
        .mapInPandas(batches, out_schema)
    )


def fake_media_table(spark, n: int = 32, kind: str = "image") -> DataFrame:
    """Deterministic fixture media table (binary payloads from a seeded
    byte pattern)."""
    rows = [
        (
            i,
            kind,
            bytes((i * 7 + j) % 256 for j in range(256 + i * 13)),
            f"{kind}/fake",
            f"src{i % 4}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).localCheckpoint()


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224,
    decode: str = "fake",
) -> DataFrame:
    """Resize plumbing: mapInPandas pass emitting fixed-dimension
    payloads.  decode='fake': deterministic byte truncation/padding stub;
    decode='real': Pillow open → resize → PNG bytes (NotImplementedError
    when Pillow is absent).  The Spark-side contract — binary in,
    (id, w, h, binary) out, Arrow batches, per-media_id balancing — is
    identical either way."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)
    n_out = (target_w * target_h) // 64  # stand-in payload size

    def _real_resize(b: bytes) -> bytes:
        try:
            from io import BytesIO

            from PIL import Image
        except ImportError as e:  # pragma: no cover - Pillow absent here
            raise NotImplementedError(
                "decode='real' requires Pillow; use decode='fake'"
            ) from e
        buf = BytesIO()
        Image.open(BytesIO(b)).resize((target_w, target_h)).save(buf, "PNG")
        return buf.getvalue()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if decode == "real":
                    out = _real_resize(b)
                else:
                    out = (b * (n_out // max(len(b), 1) + 1))[:n_out]
                rows.append((media_id, target_w, target_h, out))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    return (
        media.filter(F.col("kind") == "image")
        .repartition(F.col("media_id"))
        .mapInPandas(batches, RESIZED_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", LongType()),
    ]
)


def _real_audio_features(b: bytes) -> tuple[int, int]:
    """(duration_ms, rms) from a WAV payload via the stdlib ``wave``
    module + numpy — a REAL decode path that needs no extra packages
    (non-WAV formats would go through soundfile/librosa here)."""
    import wave
    from io import BytesIO

    import numpy as np

    with wave.open(BytesIO(b)) as w:
        n = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        frames = w.readframes(n)
    duration_ms = int(n / rate * 1000)
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype("f8")
    elif width == 1:
        samples = np.frombuffer(frames, dtype="u1").astype("f8") - 128.0
    else:
        raise NotImplementedError(f"sample width {width} not supported")
    rms = int(np.sqrt(np.mean(samples**2))) if len(samples) else 0
    return duration_ms, rms


def extract_audio_features(
    media: DataFrame, bytes_per_ms: int = 16, decode: str = "fake"
) -> DataFrame:
    """Audio feature plumbing.  decode='fake': duration from byte length
    at a nominal rate, RMS stand-in = mean byte value.  decode='real':
    stdlib WAV decode (true frame count / sample RMS) — real decoding
    without any optional dependency; other codecs would plug in
    soundfile/librosa at the same seam."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if decode == "real":
                    duration_ms, rms = _real_audio_features(b)
                else:
                    duration_ms = len(b) // bytes_per_ms
                    rms = sum(b) // len(b) if b else 0
                rows.append((media_id, len(b), duration_ms, rms))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "duration_ms", "rms"]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .repartition(F.col("media_id"))
        .mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
    )
