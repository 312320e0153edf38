"""ffmpeg-backed inter-frame video decode — the optional scale tier
behind ``video_frame_sample``'s codec seam.

The stdlib tiers decode PNG / baseline JPEG / GIF / PCM WAV /
MJPEG-AVI for real (png_codec / jpeg_codec / gif_codec); inter-frame
codecs (H.264/H.265/VP9 in MP4/WebM) have no pure-python decode
path, so this backend shells out to the ``ffmpeg`` binary when it is
present — and replays recorded invocations when it is not, through
the same record/replay seam the vision / search / connector adapters
use (``FixtureFfmpegRunner``). The SAME argv construction, stream
splitting, and frame fingerprinting runs either way.

Reference scope note: the reference's vision surface is image-only
(tools/src/aden_tools/tools/vision_tool/vision_tool.py) — video
frame sampling is this repo's extension, kept honestly optional.

Runner seam::

    runner(argv: list[str], input_bytes: bytes)
        -> (returncode, stdout_bytes, stderr_bytes)
"""

from __future__ import annotations

import hashlib
import shutil


def subprocess_runner(argv: list[str], input_bytes: bytes,
                      timeout: float = 120.0):
    """Live runner: pipe content in, collect the frame stream out."""
    import subprocess

    proc = subprocess.run(
        argv, input=input_bytes, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, timeout=timeout,
    )
    return proc.returncode, proc.stdout, proc.stderr


class FixtureFfmpegRunner:
    """Record/replay runner: responses keyed by (argv tail after the
    binary name, sha256 of input bytes) — the binary's path varies by
    host, the work it is asked to do does not. ``record`` mode wraps
    a live runner and stores every response."""

    def __init__(self, fixtures: dict | None = None, live=None):
        self.fixtures: dict[tuple, tuple] = dict(fixtures or {})
        self.live = live
        self.calls: list[tuple] = []

    @staticmethod
    def key(argv: list[str], input_bytes: bytes) -> tuple:
        return (tuple(argv[1:]), hashlib.sha256(input_bytes).hexdigest())

    def __call__(self, argv, input_bytes, timeout: float = 120.0):
        self.calls.append((list(argv), len(input_bytes)))
        k = self.key(argv, input_bytes)
        if k in self.fixtures:
            return self.fixtures[k]
        if self.live is not None:
            resp = self.live(argv, input_bytes, timeout)
            self.fixtures[k] = resp
            return resp
        return 1, b"", b"no fixture for ffmpeg invocation"


def split_mjpeg_stream(data: bytes) -> list[bytes]:
    """Split an image2pipe MJPEG byte stream into individual JPEG
    frames by SOI/EOI markers (ffmpeg concatenates whole JPEGs)."""
    frames = []
    i = 0
    n = len(data)
    while i < n - 1:
        soi = data.find(b"\xff\xd8", i)
        if soi < 0:
            break
        eoi = data.find(b"\xff\xd9", soi + 2)
        if eoi < 0:
            break
        frames.append(data[soi:eoi + 2])
        i = eoi + 2
    return frames


class FfmpegBackend:
    """Frame sampling for inter-frame codecs via ffmpeg.

    ``sample_frames(content, every_s, max_frames)`` returns
    ``[(frame_idx, ts_s, jpeg_bytes)]`` or raises ``RuntimeError``
    with ffmpeg's stderr. Frame timestamps follow the requested
    sampling rate (``fps=1/every_s``), frame_idx counts OUTPUT
    frames — the same contract the MJPEG/AVI stdlib path keeps."""

    def __init__(self, runner=None, binary: str = "ffmpeg"):
        self.binary = binary
        self.runner = runner if runner is not None else subprocess_runner

    def available(self) -> bool:
        """True when invocations can succeed: a fixture/record runner
        is plugged in, or the binary is on PATH."""
        if isinstance(self.runner, FixtureFfmpegRunner):
            return True
        return shutil.which(self.binary) is not None

    def _argv(self, every_s: float, max_frames: int) -> list[str]:
        return [
            self.binary, "-hide_banner", "-loglevel", "error",
            "-i", "pipe:0",
            "-vf", f"fps=1/{every_s:g}",
            "-frames:v", str(max_frames),
            "-f", "image2pipe", "-codec:v", "mjpeg",
            "pipe:1",
        ]

    def sample_frames(self, content: bytes, every_s: float = 1.0,
                      max_frames: int = 16):
        rc, out, err = self.runner(
            self._argv(every_s, max_frames), content
        )
        if rc != 0:
            raise RuntimeError(
                f"ffmpeg exited {rc}: {err.decode(errors='replace')[:200]}"
            )
        frames = split_mjpeg_stream(out)[:max_frames]
        return [
            (idx, round(idx * every_s, 6), jpg)
            for idx, jpg in enumerate(frames)
        ]
