"""Multimodal (binary) columns: ingestion + metadata extraction.

Reference analogs: vision_tool label/text extraction over images
(tools/src/aden_tools/tools/vision_tool/vision_tool.py:371-520) and
pdf_read page extraction (pdf_read_tool.py:20-194). Driver mandate
(§2.D): image/audio/video as opaque BINARY columns with typed
metadata; decode/feature-extract as Pandas UDFs over mapInPandas.

What is REAL here (no external libs needed):
- binaryFile ingestion -> (path, modificationTime, length, content)
- container sniffing (PNG/JPEG/GIF/WAV/PDF/MP4/AVI magic bytes)
- image dimension extraction from PNG IHDR / JPEG SOFn / GIF header
- WAV sample-rate/channels from the RIFF fmt chunk
- the mapInPandas plumbing: schema, batching, partitioning

REAL pixel decode:
- PNG (round 2): pure-stdlib codec (``png_codec`` — zlib + struct).
- JPEG (round 4): pure numpy baseline decoder (``jpeg_codec`` —
  Huffman + dequant + IDCT per ITU-T T.81), covering the dominant
  corpus format.
- GIF (round 4): LZW decoder (``gif_codec`` — palettes, interlace,
  transparency, animation frames); ``image_features`` extracts
  identical statistics for all three formats.
- MJPEG/AVI video (round 4): RIFF container parse + per-frame JPEG
  decode (``video_frame_sample`` / ``mjpeg_frame_features``) — real
  frame pixels, not hash fingerprints.
- PCM16 WAV audio: RIFF parse + int16 windows (``wav_pcm_windows``).

Inter-frame video codecs (H.264/VP9 in MP4, round 6): decoded for
real through ``ffmpeg_backend.FfmpegBackend`` when the binary (or a
recorded fixture runner) is available — pass it to
``video_frame_sample(backend=...)``. Without a backend, frame
SAMPLING stays real (container duration drives timestamps) while
frame fingerprints fall back to deterministic (content, frame_idx)
hashes; ``use_stub_decoder=False`` turns that fallback into a loud
error. ``fake_features`` remains as the deterministic stand-in for
any undecodable format so pipelines stay exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

META_SCHEMA = (
    "path string, length long, mime string, width int, height int,"
    " sample_rate int, channels int, duration_s double, sha256 string"
)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of binary assets as a DataFrame
    (path, modificationTime, length, content BINARY)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


# ---------------------------------------------------------------------------
# pure-python container parsing (public file-format specs)
# ---------------------------------------------------------------------------
def sniff_mime(b: bytes) -> str:
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if b.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if b.startswith((b"GIF87a", b"GIF89a")):
        return "image/gif"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "audio/wav"
    if b.startswith(b"RIFF") and b[8:12] == b"AVI ":
        return "video/x-msvideo"
    if b.startswith(b"%PDF-"):
        return "application/pdf"
    if len(b) >= 12 and b[4:8] == b"ftyp":  # ISO BMFF (MP4/MOV/3GP)
        return "video/mp4"
    return "application/octet-stream"


def png_size(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return w, h
    return None


def jpeg_size(b: bytes) -> tuple[int, int] | None:
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        i += 2 + seg_len
    return None


def gif_size(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return w, h
    return None


def wav_format(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, channels) from the RIFF fmt chunk."""
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 16 <= len(b):
            channels = struct.unpack("<H", b[i + 10 : i + 12])[0]
            rate = struct.unpack("<I", b[i + 12 : i + 16])[0]
            return rate, channels
        i += 8 + size + (size % 2)
    return None


def _mp4_boxes(b: bytes, start: int, end: int):
    """Iterate (type, payload_start, payload_end) over ISO BMFF boxes
    in b[start:end] (public ISO/IEC 14496-12 structure)."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i : i + 4])[0]
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1 and i + 16 <= end:  # 64-bit largesize
            size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < hdr:
            return
        yield btype, i + hdr, min(i + size, end)
        i += size


def _mp4_find(b: bytes, path: list[bytes], start: int = 0, end: int | None = None):
    """First box at the given nesting path, e.g. [b'moov', b'mvhd']."""
    end = len(b) if end is None else end
    for btype, ps, pe in _mp4_boxes(b, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _mp4_find(b, path[1:], ps, pe)
    return None


def mp4_info(b: bytes) -> tuple[float | None, int | None, int | None]:
    """(duration_s, width, height) from the moov header — REAL
    container metadata (mvhd timescale/duration; tkhd 16.16 fixed-
    point track dimensions), no codec decode. Returns Nones for
    fragmented/streamed files whose moov lacks these."""
    try:
        mvhd = _mp4_find(b, [b"moov", b"mvhd"])
        duration_s = None
        if mvhd:
            ps, _ = mvhd
            version = b[ps]
            if version == 1:
                timescale = struct.unpack(">I", b[ps + 20 : ps + 24])[0]
                duration = struct.unpack(">Q", b[ps + 24 : ps + 32])[0]
            else:
                timescale = struct.unpack(">I", b[ps + 12 : ps + 16])[0]
                duration = struct.unpack(">I", b[ps + 16 : ps + 20])[0]
            if timescale:
                duration_s = round(duration / timescale, 6)
        tkhd = _mp4_find(b, [b"moov", b"trak", b"tkhd"])
        width = height = None
        if tkhd:
            ps, pe = tkhd
            version = b[ps]
            # width/height sit after matrix: payload offset 76 (v0) /
            # 88 (v1), counting version+flags
            off = ps + (88 if version == 1 else 76)
            if off + 8 <= pe:
                width = struct.unpack(">I", b[off : off + 4])[0] >> 16
                height = struct.unpack(">I", b[off + 4 : off + 8])[0] >> 16
        return duration_s, width or None, height or None
    except Exception:
        return None, None, None


# ---------------------------------------------------------------------------
# EXIF (JPEG APP1 / TIFF 6.0 IFDs — public CIPA DC-008 structure).
# The reference's vision tool returns image metadata via a proprietary
# API (vision_tool.py:371-520); this is the public-primitive analog:
# camera fields, orientation, capture time, and GPS straight from the
# container bytes, no decode library.
# ---------------------------------------------------------------------------
_EXIF_IFD0 = {0x010F: "make", 0x0110: "model", 0x0112: "orientation", 0x0132: "datetime"}
_EXIF_SUB = {
    0x829A: "exposure_time",
    0x829D: "f_number",
    0x8827: "iso",
    0x9003: "datetime_original",
    0xA002: "pixel_width",
    0xA003: "pixel_height",
}


def _ifd_entries(t: bytes, en: str, off: int) -> list[tuple[int, int, int, bytes]]:
    if off + 2 > len(t):
        return []
    (n,) = struct.unpack_from(en + "H", t, off)
    out = []
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(t):
            break
        tag, etype, count = struct.unpack_from(en + "HHI", t, e)
        out.append((tag, etype, count, t[e + 8 : e + 12]))
    return out


def _ifd_value(t: bytes, en: str, etype: int, count: int, raw: bytes):
    size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}.get(etype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(en + "I", raw)
        data = t[off : off + total]
        if len(data) < total:
            return None
    if etype == 2:  # ASCII
        return data.split(b"\x00")[0].decode("ascii", "replace").strip()
    if etype in (1, 3, 4):
        fmt = {1: "B", 3: "H", 4: "I"}[etype]
        vals = struct.unpack(en + fmt * count, data)
        return vals[0] if count == 1 else list(vals)
    if etype == 5:  # RATIONAL pairs
        vals = []
        for k in range(count):
            num, den = struct.unpack_from(en + "II", data, 8 * k)
            vals.append(num / den if den else None)
        return vals[0] if count == 1 else vals
    return None


def _gps_decimal(coord, ref):
    if not isinstance(coord, list) or len(coord) != 3 or None in coord:
        return None
    deg = coord[0] + coord[1] / 60 + coord[2] / 3600
    return -deg if ref in ("S", "W") else deg


def exif_info(b: bytes) -> dict | None:
    """EXIF fields from a JPEG's APP1 segment (None if absent): make,
    model, orientation, datetimes, exposure/aperture/ISO, declared
    pixel dimensions, GPS decimal degrees. Both byte orders."""
    if not b.startswith(b"\xff\xd8"):
        return None
    i = 2
    while i + 4 <= len(b) and b[i] == 0xFF:
        marker = b[i + 1]
        if marker in (0xD9, 0xDA):  # EOI / image data: no EXIF ahead
            break
        (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
        if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
            t = b[i + 10 : i + 2 + seg_len]
            if len(t) < 8:  # truncated TIFF header
                return None
            en = {b"II": "<", b"MM": ">"}.get(t[:2])
            if en is None or struct.unpack(en + "H", t[2:4])[0] != 42:
                return None
            (ifd0_off,) = struct.unpack(en + "I", t[4:8])
            out: dict = {}
            sub_off = gps_off = None
            for tag, etype, count, raw in _ifd_entries(t, en, ifd0_off):
                if tag in _EXIF_IFD0:
                    out[_EXIF_IFD0[tag]] = _ifd_value(t, en, etype, count, raw)
                elif tag == 0x8769:
                    sub_off = _ifd_value(t, en, etype, count, raw)
                elif tag == 0x8825:
                    gps_off = _ifd_value(t, en, etype, count, raw)
            if isinstance(sub_off, int):
                for tag, etype, count, raw in _ifd_entries(t, en, sub_off):
                    if tag in _EXIF_SUB:
                        out[_EXIF_SUB[tag]] = _ifd_value(t, en, etype, count, raw)
            if isinstance(gps_off, int):
                gps = {
                    tag: _ifd_value(t, en, etype, count, raw)
                    for tag, etype, count, raw in _ifd_entries(t, en, gps_off)
                }
                out["gps_lat"] = _gps_decimal(gps.get(2), gps.get(1))
                out["gps_lon"] = _gps_decimal(gps.get(4), gps.get(3))
            return out or None
        i += 2 + seg_len
    return None


EXIF_SCHEMA = (
    "path string, make string, model string, orientation int,"
    " datetime_original string, exposure_time double, f_number double,"
    " iso int, gps_lat double, gps_lon double"
)


def exif_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Distributed EXIF projection over a binary table (mapInPandas,
    one row per asset; non-JPEG / EXIF-less rows keep NULL fields)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                info = exif_info(bytes(r[content_col])) or {}
                ori = info.get("orientation")
                iso = info.get("iso")
                rows.append(
                    {
                        "path": r.get("path", ""),
                        "make": info.get("make"),
                        "model": info.get("model"),
                        "orientation": int(ori) if isinstance(ori, int) else None,
                        "datetime_original": info.get("datetime_original")
                        or info.get("datetime"),
                        "exposure_time": info.get("exposure_time"),
                        "f_number": info.get("f_number"),
                        "iso": int(iso) if isinstance(iso, int) else None,
                        "gps_lat": info.get("gps_lat"),
                        "gps_lon": info.get("gps_lon"),
                    }
                )
            yield pd.DataFrame(rows)

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(parse, schema=EXIF_SCHEMA)


def extract_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas metadata extraction: mime sniff + dimensions/audio
    format + content hash. Arrow-batched; each batch is parsed in pure
    Python (cheap header reads, not full decode)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r[content_col])
                mime = sniff_mime(b)
                w = h = rate = ch = None
                dur = None
                if mime == "image/png":
                    wh = png_size(b)
                    w, h = wh if wh else (None, None)
                elif mime == "image/jpeg":
                    wh = jpeg_size(b)
                    w, h = wh if wh else (None, None)
                elif mime == "image/gif":
                    wh = gif_size(b)
                    w, h = wh if wh else (None, None)
                elif mime == "audio/wav":
                    rc = wav_format(b)
                    rate, ch = rc if rc else (None, None)
                elif mime == "video/mp4":
                    dur, w, h = mp4_info(b)
                elif mime == "video/x-msvideo":
                    from .jpeg_codec import avi_info

                    dur, w, h = avi_info(b)
                rows.append(
                    {
                        "path": r.get("path", ""),
                        "length": len(b),
                        "mime": mime,
                        "width": w,
                        "height": h,
                        "sample_rate": rate,
                        "channels": ch,
                        "duration_s": dur,
                        "sha256": hashlib.sha256(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(parse, schema=META_SCHEMA)


def fake_features(df: DataFrame, content_col: str = "content", dim: int = 16) -> DataFrame:
    """Deterministic stand-in feature extractor: a hash-derived
    fixed-length float vector per asset. Lets the multimodal pipeline
    (features -> dedup/similarity) run end-to-end without decode libs;
    identical bytes always produce identical vectors."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r[content_col])
                digest = hashlib.sha256(b).digest()
                vec = [
                    int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
                    for i in range(dim)
                ]
                rows.append({"path": r.get("path", ""), "features": vec})
            yield pd.DataFrame(rows)

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(feat, schema="path string, features array<double>")


# ---------------------------------------------------------------------------
# image: REAL PNG pixel decode (stdlib zlib codec — png_codec.py)
# ---------------------------------------------------------------------------
IMAGE_FEATURES_SCHEMA = (
    "path string, mime string, decoded boolean, width int, height int,"
    " channels int, brightness double, contrast double, n_colors int,"
    " features array<double>"
)


def image_features(df: DataFrame, content_col: str = "content", grid: int = 4) -> DataFrame:
    """Per-asset image features with REAL pixel decode for PNG, JPEG,
    and GIF.

    PNG content: stdlib zlib decode; JPEG content: pure-numpy baseline
    decode (jpeg_codec — Huffman + IDCT); GIF content: LZW decode
    (gif_codec). All yield brightness,
    contrast, distinct-color count, and a grid×grid luminance
    signature (a tiny perceptual embedding — exact dups match exactly,
    near-dups land near in cosine; feed it to the similarity/dedup
    operators). Undecodable content keeps the deterministic
    hash-derived vector (decoded=false) so the pipeline is
    schema-stable across formats.

    Public-primitive analog of the reference's vision extraction
    (vision_tool.py:371-520 calls a proprietary API; these stats come
    from the public PNG/JPEG specs alone). mapInPandas keeps each
    asset in its ingest task — the op scales with file count.
    """
    from .gif_codec import gif_features
    from .jpeg_codec import jpeg_features
    from .png_codec import png_features

    dim = grid * grid

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r[content_col])
                mime = sniff_mime(b)
                if mime == "image/png":
                    f = png_features(b, grid=grid)
                elif mime == "image/jpeg":
                    f = jpeg_features(b, grid=grid)
                elif mime == "image/gif":
                    f = gif_features(b, grid=grid)
                else:
                    f = None
                if f is not None:
                    rows.append(
                        {
                            "path": r.get("path", ""),
                            "mime": mime,
                            "decoded": True,
                            "width": f["width"],
                            "height": f["height"],
                            "channels": f["channels"],
                            "brightness": f["brightness"],
                            "contrast": f["contrast"],
                            "n_colors": f["n_colors"],
                            "features": f["grid"],
                        }
                    )
                else:
                    digest = hashlib.sha256(b).digest()
                    vec = [
                        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
                        for i in range(dim)
                    ]
                    rows.append(
                        {
                            "path": r.get("path", ""),
                            "mime": mime,
                            "decoded": False,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "brightness": None,
                            "contrast": None,
                            "n_colors": None,
                            "features": vec,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "mime",
                    "decoded",
                    "width",
                    "height",
                    "channels",
                    "brightness",
                    "contrast",
                    "n_colors",
                    "features",
                ],
            )

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(feats, schema=IMAGE_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# audio: REAL PCM16 WAV decode (numpy only — no external codec needed)
# ---------------------------------------------------------------------------
def _wav_data_chunk(b: bytes) -> tuple[int, int] | None:
    """(offset, size) of the RIFF ``data`` chunk."""
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"data":
            return i + 8, min(size, len(b) - i - 8)
        i += 8 + size + (size % 2)
    return None


def wav_pcm_windows(
    df: DataFrame, window_s: float = 0.5, content_col: str = "content"
) -> DataFrame:
    """Windowed audio features over PCM16 WAV content — REAL decode
    (RIFF parse + int16 frombuffer; channels averaged). One row per
    fixed-length window: rms and peak in [0, 1].

    This is the audio analog of text shingling for a training
    pipeline: the windows feed dedup/similarity over feature vectors.
    mapInPandas keeps Arrow batching; each file's windows stay in its
    task, so the op scales with file count, not corpus bytes-per-task.
    Non-WAV / non-PCM16 rows are skipped (schema-stable).
    """
    import numpy as np

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r[content_col])
                if sniff_mime(b) != "audio/wav":
                    continue
                fmt = wav_format(b)
                data = _wav_data_chunk(b)
                if not fmt or not data:
                    continue
                rate, ch = fmt
                off, size = data
                if rate <= 0 or ch <= 0:
                    continue
                pcm = np.frombuffer(b, dtype="<i2", count=size // 2, offset=off)
                if ch > 1:
                    pcm = pcm[: len(pcm) - len(pcm) % ch].reshape(-1, ch).mean(axis=1)
                x = pcm.astype(np.float64) / 32768.0
                step = max(1, int(rate * window_s))
                for wi in range(0, len(x), step):
                    seg = x[wi : wi + step]
                    rows.append(
                        {
                            "path": r.get("path", ""),
                            "window_idx": wi // step,
                            "start_s": round(wi / rate, 6),
                            "n_samples": len(seg),
                            "rms": float(np.sqrt(np.mean(seg * seg))),
                            "peak": float(np.max(np.abs(seg))) if len(seg) else 0.0,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["path", "window_idx", "start_s", "n_samples", "rms", "peak"],
            )

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(
        windows,
        schema="path string, window_idx long, start_s double, n_samples long,"
        " rms double, peak double",
    )


# ---------------------------------------------------------------------------
# video: frame sampling — REAL frames for MJPEG/AVI (per-frame JPEG
# decode, no inter-frame codec needed); MP4 keeps real container
# timing with fingerprint payloads (H.264 decode needs ffmpeg).
# ---------------------------------------------------------------------------
def video_frame_sample(
    df: DataFrame,
    every_s: float = 1.0,
    max_frames: int = 16,
    content_col: str = "content",
    use_stub_decoder: bool = True,
    backend=None,
) -> DataFrame:
    """Frame-sampling over opaque video content: one row per sampled
    frame (path, frame_idx, ts_s, frame_sha256), bounded by
    ``max_frames`` so a long video cannot blow up a task.

    MJPEG/AVI content is sampled for REAL: the RIFF container is
    parsed, frame timestamps come from the stream rate, and
    ``frame_sha256`` fingerprints the ACTUAL sampled frame's JPEG
    bytes (identical frames collide — the dedup property).

    Inter-frame codecs (H.264/VP9 in MP4 etc.) are decoded for real
    when an ``ffmpeg_backend.FfmpegBackend`` is passed: the backend
    runs on the EXECUTORS (it pickles by value with its runner —
    fixture runners replay recorded invocations, the live runner
    shells out to the binary) and ``frame_sha256`` fingerprints the
    actual transcoded frames. Without a backend, MP4 keeps real
    container DURATION (moov mvhd via ``mp4_info``) and fingerprint
    payloads derive from (content, frame_idx) — honest
    schema-identical placeholders; ``use_stub_decoder=False`` makes
    that fallback an error instead."""
    from .jpeg_codec import avi_info, avi_mjpeg_frames

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r[content_col])
                mime = sniff_mime(b)
                path = r.get("path", "")
                if mime == "video/x-msvideo":
                    jframes = avi_mjpeg_frames(b)
                    dur, _, _ = avi_info(b)
                    if jframes:
                        spf = (dur / len(jframes)) if dur else 0.1
                        stride = max(1, round(every_s / spf)) if spf > 0 else 1
                        for n_out, fi in enumerate(
                            range(0, len(jframes), stride)
                        ):
                            if n_out >= max_frames:
                                break
                            rows.append(
                                {
                                    "path": path,
                                    "frame_idx": fi,
                                    "ts_s": round(fi * spf, 6),
                                    "frame_sha256": hashlib.sha256(
                                        jframes[fi]
                                    ).hexdigest(),
                                }
                            )
                        continue
                if backend is not None and mime.startswith("video/"):
                    sampled = backend.sample_frames(
                        b, every_s=every_s, max_frames=max_frames
                    )
                    for fi, ts, jpg in sampled:
                        rows.append(
                            {
                                "path": path,
                                "frame_idx": fi,
                                "ts_s": ts,
                                "frame_sha256": hashlib.sha256(
                                    jpg
                                ).hexdigest(),
                            }
                        )
                    continue
                if not use_stub_decoder:
                    raise ValueError(
                        f"no real decode path for {mime or 'unknown'} "
                        "content: pass an ffmpeg_backend.FfmpegBackend "
                        "(inter-frame codecs need ffmpeg) or allow the "
                        "deterministic placeholder tier"
                    )
                real_dur, _, _ = (
                    mp4_info(b) if mime == "video/mp4" else (None, None, None)
                )
                fake_duration_s = (
                    real_dur if real_dur else max(1.0, len(b) / 65536.0)
                )
                n = min(max_frames, int(fake_duration_s / every_s) + 1)
                for fi in range(n):
                    ts = round(fi * every_s, 6)
                    fp = hashlib.sha256(b + fi.to_bytes(4, "big")).hexdigest()
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": fi,
                            "ts_s": ts,
                            "frame_sha256": fp,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["path", "frame_idx", "ts_s", "frame_sha256"]
            )

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(
        frames,
        schema="path string, frame_idx long, ts_s double, frame_sha256 string",
    )


MJPEG_FRAME_SCHEMA = (
    "path string, frame_idx long, ts_s double, decoded boolean,"
    " width int, height int, brightness double, contrast double,"
    " features array<double>"
)


def mjpeg_frame_features(
    df: DataFrame,
    every_s: float = 1.0,
    max_frames: int = 16,
    content_col: str = "content",
    grid: int = 4,
) -> DataFrame:
    """REAL per-frame pixel features for MJPEG/AVI video: parse the
    RIFF container, decode each sampled frame with the baseline JPEG
    decoder, and emit the same luminance-grid signature the image tier
    produces — video dedup/similarity runs on actual frame pixels.

    Scale shape mirrors ``image_features``: mapInPandas keeps each
    clip in its ingest task, only (small) feature vectors — never
    pixels — reach any shuffle, and frames are bounded by
    ``max_frames``. Undecodable frames yield decoded=false rows with a
    hash fallback vector (schema-stable)."""
    from .jpeg_codec import avi_info, avi_mjpeg_frames, jpeg_features

    dim = grid * grid

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r[content_col])
                path = r.get("path", "")
                jframes = avi_mjpeg_frames(b)
                if not jframes:
                    continue
                dur, _, _ = avi_info(b)
                spf = (dur / len(jframes)) if dur else 0.1
                stride = max(1, round(every_s / spf)) if spf > 0 else 1
                for n_out, fi in enumerate(range(0, len(jframes), stride)):
                    if n_out >= max_frames:
                        break
                    f = jpeg_features(jframes[fi], grid=grid)
                    if f is not None:
                        rows.append(
                            {
                                "path": path,
                                "frame_idx": fi,
                                "ts_s": round(fi * spf, 6),
                                "decoded": True,
                                "width": f["width"],
                                "height": f["height"],
                                "brightness": f["brightness"],
                                "contrast": f["contrast"],
                                "features": f["grid"],
                            }
                        )
                    else:
                        digest = hashlib.sha256(jframes[fi]).digest()
                        vec = [
                            int.from_bytes(digest[2 * i : 2 * i + 2], "big")
                            / 65535.0
                            for i in range(dim)
                        ]
                        rows.append(
                            {
                                "path": path,
                                "frame_idx": fi,
                                "ts_s": round(fi * spf, 6),
                                "decoded": False,
                                "width": None,
                                "height": None,
                                "brightness": None,
                                "contrast": None,
                                "features": vec,
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "frame_idx",
                    "ts_s",
                    "decoded",
                    "width",
                    "height",
                    "brightness",
                    "contrast",
                    "features",
                ],
            )

    cols = [c for c in ("path", content_col) if c in df.columns]
    return df.select(*cols).mapInPandas(feats, schema=MJPEG_FRAME_SCHEMA)
