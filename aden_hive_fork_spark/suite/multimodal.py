"""Multimodal suite entries with REAL pixel decode (SURVEY.md §2.D).

q81 exercises the full image pipeline distributively: synthesize
deterministic PNGs AND baseline JPEGs on executors (stdlib/numpy
encoders), decode them back (zlib PNG codec + Huffman/IDCT JPEG
codec), extract brightness/palette/grid features, and group identical
feature signatures — the image-dedup pass of a training-data
pipeline. q111 does the same for VIDEO via MJPEG/AVI (per-frame JPEG
decode). Rows-only by declaration (DuckDB has no image codecs), but
fully deterministic: the same inputs decode to the same signature
groups on every run.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from . import query
from ._helpers import T


def _doc_pattern(doc_id: int):
    """Deterministic 16x16 RGB pixel pattern keyed on doc_id % 8."""
    import numpy as np

    k = doc_id % 8
    y, x = np.mgrid[0:16, 0:16]
    return np.stack(
        [
            (x * (k + 1) * 4) % 256,
            (y * (k + 2) * 4) % 256,
            ((x + y) * (k + 3) * 2) % 256,
        ],
        axis=-1,
    ).astype("uint8")


def _doc_image(doc_id: int) -> tuple[str, bytes]:
    """(path, bytes): alternating blocks of 8 ids encode the pattern
    as PNG vs baseline JPEG — the format axis (doc_id // 8) is
    INDEPENDENT of the pattern axis (doc_id % 8), so 64 docs yield
    exactly 16 distinct decoded signatures (8 patterns × 2 codecs;
    JPEG is lossy, so its decoded stats differ deterministically from
    the PNG of the same pattern), 4 images each."""
    img = _doc_pattern(doc_id)
    if (doc_id // 8) % 2 == 0:
        from ..sources.png_codec import png_encode

        return f"img_{doc_id:04d}.png", png_encode(img)
    from ..sources.jpeg_codec import jpeg_encode_baseline

    return f"img_{doc_id:04d}.jpg", jpeg_encode_baseline(img, quality=90)


@query("q81_image_dedup_features")
def q81_image_dedup_features(spark, sf_dir):
    """Image near-dup grouping over decoded pixel features — BOTH
    codecs real: PNG via the stdlib zlib codec, JPEG via the numpy
    baseline decoder (Huffman + IDCT, jpeg_codec.py).

    64 synthetic images (8 patterns × {PNG, JPEG}) are generated AND
    decoded on executors; identical decoded signatures (brightness,
    contrast, color count, luminance grid) collapse to 16 groups of 4.
    At 100 TB the binary column comes from binaryFile ingest instead —
    the decode/feature/groupBy plan is identical.
    """
    from ..sources.binary import image_features

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [_doc_image(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "path": [p for p, _ in pairs],
                    "content": [c for _, c in pairs],
                }
            )

    bin_df = docs.mapInPandas(gen, "path string, content binary")
    feats = image_features(bin_df, grid=4)
    sig = F.sha2(F.concat_ws(",", F.col("features").cast("array<string>")), 256)
    return (
        feats.filter(F.col("decoded"))
        .withColumn("sig", F.substring(sig, 1, 16))
        .groupBy("sig", "width", "height", "channels", "n_colors")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.min("brightness"), 6).alias("brightness"),
            F.round(F.min("contrast"), 6).alias("contrast"),
            F.min("path").alias("canonical_path"),
        )
        .orderBy("sig")
    )


def _doc_mp4(doc_id: int) -> bytes:
    """Deterministic minimal ISO BMFF clip: duration/dimensions derive
    from doc_id, so metadata extraction is oracle-free but exactly
    reproducible."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    timescale = 1000
    duration_ms = 1000 + (doc_id % 10) * 500  # 1.0s .. 5.5s
    width, height = 320 + (doc_id % 4) * 160, 180 + (doc_id % 4) * 90
    mvhd = (
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">I", timescale) + struct.pack(">I", duration_ms)
        + b"\x00" * 80
    )
    tkhd = (
        b"\x00\x00\x00\x0f" + b"\x00" * 72
        + struct.pack(">I", width << 16) + struct.pack(">I", height << 16)
    )
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + box(b"mdat", b"\x00" * 64)


@query("q89_video_metadata")
def q89_video_metadata(spark, sf_dir):
    """Video-tier metadata pipeline: 48 synthetic MP4 containers are
    built AND header-parsed on executors (mvhd duration, tkhd
    dimensions — real ISO BMFF parsing, no codec), then grouped by
    resolution with duration stats, plus frame-sampling counts driven
    by the REAL container duration. Rows-only (DuckDB has no MP4
    parser) but fully deterministic."""
    from ..sources.binary import extract_metadata, video_frame_sample

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 48)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"clip_{int(d):04d}.mp4" for d in pdf["doc_id"]],
                    "content": [_doc_mp4(int(d)) for d in pdf["doc_id"]],
                }
            )

    clips = docs.mapInPandas(gen, "path string, content binary")
    meta = extract_metadata(clips)
    frames = (
        video_frame_sample(clips, every_s=1.0, max_frames=8)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    return (
        meta.join(frames, "path")
        .groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.round(F.min("duration_s"), 3).alias("min_duration_s"),
            F.round(F.max("duration_s"), 3).alias("max_duration_s"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("width")
    )


@query("q94_vision_annotations")
def q94_vision_annotations(spark, sf_dir):
    """Corpus-scale vision annotation (§2.A row 36 extraction tier):
    deterministic PNGs — with embedded tEXt metadata as the local OCR
    analog — are synthesized AND annotated on executors
    (sources/vision.annotate_images: heuristic labels, text chunks,
    dominant colors), then label statistics aggregate per top label.
    Rows-only by declaration (DuckDB has no PNG codec) but exactly
    reproducible: the same 48 images produce the same annotation
    rollup every run. At 100 TB the binary column comes from
    binaryFile ingest; the annotate plan is map-only either way."""
    from ..sources.png_codec import png_encode
    from ..sources.vision import annotate_images

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 48)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            paths, blobs = [], []
            for d in pdf["doc_id"]:
                k = int(d) % 6
                y, x = np.mgrid[0:12, 0:12]
                img = np.stack(
                    [
                        (x * (k + 1) * 9) % 256,
                        (y * (k + 2) * 9) % 256,
                        ((x + y) * (k + 1) * 5) % 256,
                    ],
                    axis=-1,
                ).astype("uint8")
                paths.append(f"vimg_{int(d):04d}.png")
                blobs.append(
                    png_encode(img, texts={"caption": f"pattern {k}", "group": str(k)})
                )
            yield pd.DataFrame({"path": paths, "content": blobs})

    bin_df = docs.mapInPandas(gen, "path string, content binary")
    ann = annotate_images(bin_df, max_labels=10)
    label_sig = F.concat_ws(
        "|", F.transform(F.col("labels"), lambda l: l["description"])
    )
    dom = F.col("colors")[0]
    return (
        ann.filter(F.col("error").isNull())
        .select(
            F.split(F.col("text"), "\n")[0].alias("caption"),
            label_sig.alias("label_sig"),
            F.concat_ws(
                ",", dom["red"], dom["green"], dom["blue"]
            ).alias("dominant_rgb"),
            F.round(dom["pixel_fraction"], 3).alias("dom_fraction"),
        )
        .groupBy("caption", "label_sig", "dominant_rgb", "dom_fraction")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .orderBy("caption", "label_sig")
    )


def _doc_wav(doc_id: int) -> bytes:
    """Deterministic PCM16 mono WAV: 0.5 s sine, frequency and
    amplitude derived from doc_id — same id, same bytes."""
    import io
    import math
    import struct as _st
    import wave as wavmod

    rate = 8000
    freq = 220 * (1 + doc_id % 4)        # 220/440/660/880 Hz
    amp = 0.2 + 0.15 * (doc_id % 3)      # 0.2 / 0.35 / 0.5
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                _st.pack(
                    "<h",
                    int(amp * 32767 * math.sin(2 * math.pi * freq * i / rate)),
                )
                for i in range(rate // 2)
            )
        )
    return buf.getvalue()


@query("q109_audio_features")
def q109_audio_features(spark, sf_dir):
    """Audio modality under the declared suite (rows-only: DuckDB has
    no WAV decoder, but the pipeline is exactly reproducible):
    deterministic sine clips are synthesized AND decoded on executors
    (sources/binary.wav_pcm_windows — real RIFF parse + PCM16
    decode), then window RMS/peak statistics aggregate per amplitude
    class. 24 clips × 2 windows; a sine's RMS is amp/√2, so the
    grouped means are analytically predictable."""
    from typing import Iterator as _It

    from ..sources.binary import wav_pcm_windows

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 24)

    def gen(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"clip_{int(d):04d}.wav" for d in pdf["doc_id"]],
                    "content": [_doc_wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    clips = docs.mapInPandas(gen, "path string, content binary")
    win = wav_pcm_windows(clips, window_s=0.25)
    amp_class = F.regexp_extract("path", r"clip_(\d+)", 1).cast("int") % 3
    return (
        win.groupBy(amp_class.alias("amp_class"))
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.round(F.avg("rms"), 4).alias("avg_rms"),
            F.round(F.avg("peak"), 4).alias("avg_peak"),
            F.round(F.min("rms"), 4).alias("min_rms"),
            F.round(F.max("rms"), 4).alias("max_rms"),
        )
        .orderBy("amp_class")
    )


def _doc_avi(doc_id: int) -> bytes:
    """Deterministic MJPEG/AVI clip: 4 + doc_id % 3 frames at 4 fps.
    Frames are solid-color JPEGs whose gray level steps by 32 per
    frame from a doc-derived base, so per-frame decoded brightness is
    analytically (base + 32·i)/255 up to DC quantization."""
    import numpy as np

    from ..sources.jpeg_codec import avi_mjpeg_encode, jpeg_encode_baseline

    base = 40 + (doc_id % 4) * 24
    n_frames = 4 + doc_id % 3
    frames = [
        jpeg_encode_baseline(
            np.full((16, 16, 3), min(255, base + 32 * i), np.uint8), quality=100
        )
        for i in range(n_frames)
    ]
    return avi_mjpeg_encode(frames, fps=4)


@query("q111_mjpeg_frame_features")
def q111_mjpeg_frame_features(spark, sf_dir):
    """VIDEO tier with REAL frame pixels: 36 synthetic MJPEG/AVI clips
    are packed AND frame-decoded on executors (RIFF parse → baseline
    JPEG decode per frame → luminance features), replacing the
    hash-fingerprint fallback for this container. Grouped per clip
    class: frame counts and brightness stats are analytically
    predictable (solid frames stepping +32 gray per frame). Rows-only
    (DuckDB has no JPEG codec) but exactly reproducible. At 100 TB
    only feature vectors reach the shuffle — never pixels; decode
    stays in the ingest task (mapInPandas)."""
    from ..sources.binary import mjpeg_frame_features

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 36)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"clip_{int(d):04d}.avi" for d in pdf["doc_id"]],
                    "content": [_doc_avi(int(d)) for d in pdf["doc_id"]],
                }
            )

    clips = docs.mapInPandas(gen, "path string, content binary")
    frames = mjpeg_frame_features(clips, every_s=0.25, max_frames=8)
    clip_class = F.regexp_extract("path", r"clip_(\d+)", 1).cast("int") % 12
    return (
        frames.filter(F.col("decoded"))
        .groupBy(clip_class.alias("clip_class"))
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.round(F.min("brightness"), 4).alias("first_brightness"),
            F.round(F.max("brightness"), 4).alias("last_brightness"),
            F.round(F.avg("contrast"), 4).alias("avg_contrast"),
            F.min("width").alias("width"),
        )
        .orderBy("clip_class")
    )


def _variant_pattern(k: int):
    """Eight STRUCTURALLY distinct 16x16 patterns (stripes, checker,
    rings, corners, ramps) — unlike the q81 gradient family, their
    luminance-grid signatures are far apart in cosine, so codec
    artifacts (small perturbations) can never bridge two patterns."""
    import numpy as np

    y, x = np.mgrid[0:16, 0:16]
    base = [
        np.where(x < 8, 230, 25),                # left half bright
        np.where(y < 8, 230, 25),                # top half bright
        np.where(x + y < 16, 230, 25),           # diagonal split
        np.where((x >= 4) & (x < 12) & (y >= 4) & (y < 12), 240, 20),  # center
        np.where((x < 8) & (y < 8), 245, 30),    # one bright corner
        np.where((x >= 8) & (y >= 8), 245, 30),  # opposite corner
        np.where(((x < 8) & (y >= 8)) | ((x >= 8) & (y < 8)), 235, 20),  # anti-diag corners
        np.minimum(x, y) * 16,                   # corner-anchored ramp
    ][k % 8]
    lum = np.clip(base, 0, 255)
    return np.stack([lum, lum, lum], axis=-1).astype("uint8")


def _doc_variant(doc_id: int) -> tuple[str, bytes]:
    """Pattern k = doc_id % 8 rendered through 4 encoder variants
    (doc_id // 8): lossless PNG, JPEG q95, JPEG q75, JPEG q95 4:2:0 —
    same underlying pixels, different codec artifacts, so decoded
    feature vectors are NEAR-identical within a pattern and far apart
    across patterns."""
    img = _variant_pattern(doc_id % 8)
    v = (doc_id // 8) % 4
    if v == 0:
        from ..sources.png_codec import png_encode

        return f"var_{doc_id:04d}.png", png_encode(img)
    from ..sources.jpeg_codec import jpeg_encode_baseline

    quality = {1: 95, 2: 75, 3: 95}[v]
    return (
        f"var_{doc_id:04d}.jpg",
        jpeg_encode_baseline(img, quality=quality, subsample=(v == 3)),
    )


@query("q112_image_neardup_clusters")
def q112_image_neardup_clusters(spark, sf_dir):
    """END-TO-END multimodal near-dup: the decoded-pixel feature tier
    (PNG + JPEG codecs) feeds the SAME similarity/clustering operators
    the text tier uses — cosine pairs over luminance-grid signatures
    (cosine_neardup_pairs, one matmul per block) → connected
    components → cluster rollup. 32 images = 8 patterns × 4 codec
    variants (lossless PNG, JPEG q95/q75/q95-4:2:0) must collapse to
    exactly 8 clusters of 4: codec artifacts perturb the features but
    never across the 0.99-cosine boundary, while distinct patterns
    stay far below it. Rows-only (no DuckDB codecs), fully
    deterministic. At 100 TB: features (16 doubles) are the shuffle
    payload; block before pairing (here the resolution is the block)."""
    from ..operators.dedup import connected_components
    from ..operators.similarity import cosine_neardup_pairs
    from ..sources.binary import image_features

    docs = T(spark, sf_dir, "documents").select("doc_id").filter(F.col("doc_id") < 32)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [_doc_variant(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "path": [p for p, _ in pairs],
                    "content": [c for _, c in pairs],
                }
            )

    bin_df = docs.mapInPandas(gen, "path string, content binary")
    feats = (
        image_features(bin_df, grid=4)
        .filter(F.col("decoded"))
        .select(
            F.regexp_extract("path", r"var_(\d+)", 1).cast("long").alias("vec_id"),
            F.col("features").alias("embedding"),
            F.col("width").alias("block"),
        )
    )
    pairs = cosine_neardup_pairs(
        feats, threshold=0.99, block_col="block"
    )
    comps = connected_components(pairs, "id_a", "id_b")
    return (
        comps.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(
            F.col("comp").cast("bigint").alias("cluster_rep"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
        .orderBy("cluster_rep")
    )
