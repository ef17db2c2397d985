"""Multimodal column plumbing: schemas, mapInPandas batch shapes, fanout,
and the strict-decode stub."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.multimodal import (
    extract_image_features,
    fake_media_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return fake_media_table(spark, n=16, kind="image")


def test_image_features_schema_and_determinism(spark, media):
    feats = extract_image_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 16
    assert set(feats.columns) == {"media_id", "width", "height", "n_bytes", "phash"}
    # deterministic across runs
    rows2 = {r.media_id: r for r in extract_image_features(media).collect()}
    assert all(rows[i] == rows2[i] for i in rows)
    assert rows[0].n_bytes == 256


def test_strict_decode_raises(spark, media):
    feats = extract_image_features(media, decode="strict")
    with pytest.raises(Exception, match="NotImplementedError|Pillow|decod"):
        feats.collect()


def test_frame_sampling_fanout(spark):
    vids = fake_media_table(spark, n=4, kind="video")
    frames = sample_frames(vids, every_n_bytes=64, max_frames=3)
    per = {r[0]: r[1] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert per == {0: 3, 1: 3, 2: 3, 3: 3}
    one = frames.filter((F.col("media_id") == 0) & (F.col("frame_idx") == 0)).first()
    assert len(one.frame) == 64


def test_resize_images_contract(spark):
    from graphdb_for_drones_spark.operators.multimodal import (
        fake_media_table,
        resize_images,
    )

    media = fake_media_table(spark, n=6, kind="image")
    out = resize_images(media, target_w=32, target_h=32).collect()
    assert len(out) == 6
    n_out = (32 * 32) // 64
    for r in out:
        assert (r.width, r.height) == (32, 32)
        assert len(r.content) == n_out


def test_extract_audio_features(spark):
    from graphdb_for_drones_spark.operators.multimodal import (
        extract_audio_features,
        fake_media_table,
    )

    media = fake_media_table(spark, n=4, kind="audio")
    rows = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r.duration_ms == r.n_bytes // 16
        assert 0 <= r.rms <= 255


def _wav_bytes(freq=440.0, ms=250, rate=8000):
    import math
    import struct
    import wave
    from io import BytesIO

    buf = BytesIO()
    n = rate * ms // 1000
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(10000 * math.sin(2 * math.pi * freq * i / rate))
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_audio_real_decode_wav(spark):
    # decode='real' through the stdlib WAV path: true duration + RMS
    from graphdb_for_drones_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    rows = [(1, "audio", _wav_bytes(ms=250), "audio/wav", "s0"),
            (2, "audio", _wav_bytes(ms=500), "audio/wav", "s0")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).localCheckpoint()
    got = {r.media_id: r for r in extract_audio_features(media, decode="real").collect()}
    assert got[1].duration_ms == 250 and got[2].duration_ms == 500
    # RMS of a 10000-amplitude sine ~ 10000/sqrt(2) ~ 7071
    assert 6800 < got[1].rms < 7300


def test_image_real_decode_requires_pillow(spark):
    # without Pillow decode='real' must fail loudly, not silently fake
    import pytest

    from graphdb_for_drones_spark.operators.multimodal import (
        extract_image_features,
        fake_media_table,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: the strict-failure contract is moot")
    except ImportError:
        pass
    media = fake_media_table(spark, n=2)
    with pytest.raises(Exception):  # NotImplementedError via PythonException
        extract_image_features(media, decode="real").collect()


def test_image_real_decode_roundtrip(spark):
    # runs only where Pillow exists: real decode + average-hash + resize
    import pytest

    PIL = pytest.importorskip(  # noqa: N806
        "PIL",
        reason="Pillow not installed in this container; the real-decode "
        "path is exercised wherever Pillow exists (the fake-decode twin "
        "covers the Spark plumbing here)",
    )
    from io import BytesIO

    from PIL import Image

    from graphdb_for_drones_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
        resize_images,
    )

    buf = BytesIO()
    Image.new("RGB", (17, 9), (200, 10, 10)).save(buf, "PNG")
    media = spark.createDataFrame(
        [(1, "image", buf.getvalue(), "image/png", "s0")], MEDIA_SCHEMA
    ).localCheckpoint()
    feat = extract_image_features(media, decode="real").first()
    assert (feat.width, feat.height) == (17, 9)
    rs = resize_images(media, 8, 8, decode="real").first()
    out = Image.open(BytesIO(bytes(rs.content)))
    assert out.size == (8, 8)


def test_video_real_decode_avi_roundtrip(spark):
    # decode='real' through the stdlib RIFF/AVI walk: exact raw frames
    # back out, source frame indices preserved under sampling
    from graphdb_for_drones_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
        synthetic_avi,
    )

    avi1, frames1 = synthetic_avi(n_frames=5, width=4, height=3, seed=1)
    avi2, frames2 = synthetic_avi(n_frames=12, width=2, height=2, seed=2)
    media = spark.createDataFrame(
        [(1, "video", avi1, "video/avi", "s0"),
         (2, "video", avi2, "video/avi", "s0")],
        MEDIA_SCHEMA,
    ).localCheckpoint()

    got = sample_frames(media, max_frames=4, decode="real").collect()
    by_vid = {}
    for r in got:
        by_vid.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame)
    # video 1: 5 frames > max 4 → uniform sample at source idx 0,1,2,3
    assert set(by_vid[1]) == {0, 1, 2, 3}
    assert all(by_vid[1][i] == frames1[i] for i in by_vid[1])
    # video 2: 12 frames → stride-3 sample, SOURCE indices kept
    assert set(by_vid[2]) == {0, 3, 6, 9}
    assert all(by_vid[2][i] == frames2[i] for i in by_vid[2])


def test_video_real_decode_all_frames_when_under_cap(spark):
    from graphdb_for_drones_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
        synthetic_avi,
    )

    avi, frames = synthetic_avi(n_frames=3, width=2, height=2, seed=7)
    media = spark.createDataFrame(
        [(9, "video", avi, "video/avi", "s0")], MEDIA_SCHEMA
    ).localCheckpoint()
    got = sorted(
        sample_frames(media, max_frames=8, decode="real").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [bytes(r.frame) for r in got] == frames


def test_video_real_decode_non_avi_requires_ffmpeg(spark):
    # without ffmpeg, a non-AVI payload must fail loudly under
    # decode='real' (mirrors the Pillow contract for images)
    import shutil

    from graphdb_for_drones_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg installed: the strict-failure contract is moot")
    media = spark.createDataFrame(
        [(1, "video", b"\x00\x01\x02mp4-ish", "video/mp4", "s0")],
        MEDIA_SCHEMA,
    ).localCheckpoint()
    with pytest.raises(Exception):  # NotImplementedError via PythonException
        sample_frames(media, decode="real").collect()


def test_video_real_decode_ffmpeg_path(spark):
    # runs only where ffmpeg exists: real PNG frames from a real encode
    import shutil
    import subprocess
    import tempfile

    if shutil.which("ffmpeg") is None:
        pytest.skip(
            "ffmpeg not installed in this container; the stdlib AVI path "
            "above exercises real decode, this covers codec video"
        )
    import os

    from graphdb_for_drones_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "t.mp4")
        subprocess.run(
            ["ffmpeg", "-v", "error", "-f", "lavfi",
             "-i", "testsrc=duration=1:size=64x64:rate=10", out],
            check=True,
        )
        payload = open(out, "rb").read()
    media = spark.createDataFrame(
        [(1, "video", payload, "video/mp4", "s0")], MEDIA_SCHEMA
    ).localCheckpoint()
    got = sample_frames(media, max_frames=3, decode="real").collect()
    assert len(got) == 3
    assert all(bytes(r.frame)[:8] == b"\x89PNG\r\n\x1a\n" for r in got)
