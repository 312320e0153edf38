"""ffmpeg backend tests: argv construction, MJPEG stream splitting,
fixture record/replay keying, error propagation, and real inter-frame
frame sampling through video_frame_sample on the executors — all
hermetic via FixtureFfmpegRunner (the vision-adapter seam pattern)."""

from __future__ import annotations

import hashlib

import pytest

from aden_hive_fork_spark.sources.binary import video_frame_sample
from aden_hive_fork_spark.sources.ffmpeg_backend import (
    FfmpegBackend,
    FixtureFfmpegRunner,
    split_mjpeg_stream,
)

# two tiny syntactically-marked JPEG payloads (SOI ... EOI)
JPG1 = b"\xff\xd8\xff\xe0payload-one\xff\xd9"
JPG2 = b"\xff\xd8\xff\xe0payload-two!\xff\xd9"
MP4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 128


def test_split_mjpeg_stream():
    assert split_mjpeg_stream(JPG1 + JPG2) == [JPG1, JPG2]
    assert split_mjpeg_stream(b"") == []
    # truncated trailing frame is dropped, not mangled
    assert split_mjpeg_stream(JPG1 + b"\xff\xd8\xffdangling") == [JPG1]


def test_argv_shape():
    b = FfmpegBackend(runner=FixtureFfmpegRunner())
    argv = b._argv(0.5, 8)
    assert argv[0] == "ffmpeg"
    assert "fps=1/0.5" in argv and "-frames:v" in argv
    assert argv[-1] == "pipe:1" and "pipe:0" in argv


def test_sample_frames_replays_fixture_and_timestamps():
    backend = FfmpegBackend(runner=FixtureFfmpegRunner({
        FixtureFfmpegRunner.key(
            FfmpegBackend()._argv(2.0, 4), MP4
        ): (0, JPG1 + JPG2, b""),
    }))
    assert backend.available()
    frames = backend.sample_frames(MP4, every_s=2.0, max_frames=4)
    assert [(f[0], f[1]) for f in frames] == [(0, 0.0), (1, 2.0)]
    assert frames[0][2] == JPG1 and frames[1][2] == JPG2


def test_sample_frames_error_propagates_stderr():
    backend = FfmpegBackend(runner=FixtureFfmpegRunner())  # no fixture
    with pytest.raises(RuntimeError, match="no fixture"):
        backend.sample_frames(MP4)


def test_fixture_key_ignores_binary_path():
    a = FixtureFfmpegRunner.key(["/usr/bin/ffmpeg", "-i", "pipe:0"], MP4)
    b = FixtureFfmpegRunner.key(["ffmpeg", "-i", "pipe:0"], MP4)
    assert a == b


def test_video_frame_sample_with_backend_distributed(spark):
    fixtures = {
        FixtureFfmpegRunner.key(
            FfmpegBackend()._argv(1.0, 16), MP4
        ): (0, JPG1 + JPG2, b""),
    }
    backend = FfmpegBackend(runner=FixtureFfmpegRunner(fixtures))
    df = spark.createDataFrame(
        [("clip.mp4", bytearray(MP4))], "path string, content binary"
    )
    rows = video_frame_sample(df, backend=backend).collect()
    assert [(r["frame_idx"], r["ts_s"]) for r in rows] == [(0, 0.0), (1, 1.0)]
    # fingerprints are of the ACTUAL transcoded frame bytes
    assert rows[0]["frame_sha256"] == hashlib.sha256(JPG1).hexdigest()
    assert rows[1]["frame_sha256"] == hashlib.sha256(JPG2).hexdigest()


def test_video_frame_sample_without_backend_keeps_placeholder_tier(spark):
    df = spark.createDataFrame(
        [("clip.mp4", bytearray(MP4))], "path string, content binary"
    )
    rows = video_frame_sample(df).collect()
    # schema-stable placeholder fingerprints, deterministic per (content, idx)
    assert rows and all(len(r["frame_sha256"]) == 64 for r in rows)
    want = hashlib.sha256(MP4 + (0).to_bytes(4, "big")).hexdigest()
    assert rows[0]["frame_sha256"] == want
