"""Stdlib PNG codec + real image feature extraction
(VERDICT r1 "Next round" #9 — replaces the fake_features stub for PNG).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.sources.png_codec import png_decode, png_encode, png_features


def _gradient(h=12, w=10, ch=3):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 20) % 256, (y * 17) % 256, ((x + y) * 9) % 256][:ch], axis=-1)
    return img.astype("uint8")


def test_roundtrip_rgb():
    img = _gradient()
    out = png_decode(png_encode(img))
    assert out is not None and np.array_equal(out, img)


def test_roundtrip_gray_and_alpha():
    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    assert np.array_equal(png_decode(png_encode(gray)), gray[:, :, None])
    rgba = np.dstack([_gradient(8, 8), np.full((8, 8), 200, np.uint8)])
    assert np.array_equal(png_decode(png_encode(rgba)), rgba)


def test_decode_all_filter_types():
    """A PNG using filters 1-4 (written by hand) must defilter
    correctly: re-encode of the decoded pixels round-trips."""
    import struct
    import zlib

    img = _gradient(6, 6)
    stride = 6 * 3
    flat = img.reshape(6, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4, 2]):
        cur = flat[y]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur.copy()
            enc[3:] = (cur[3:] - cur[:-3]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = cur.copy()
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
        else:  # paeth
            enc = cur.copy()
            for i in range(stride):
                a = int(cur[i - 3]) if i >= 3 else 0
                c = int(prev[i - 3]) if i >= 3 else 0
                p = int(prev[i])
                pp = a + p - c
                pa, pb, pc = abs(pp - a), abs(pp - p), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (p if pb <= pc else c)
                enc[i] = (cur[i] - pred) % 256
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    b = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 6, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    out = png_decode(b)
    assert out is not None and np.array_equal(out, img)


def test_palette_png_expands_to_rgb():
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx_rows = [bytes([0]) + bytes([0, 1, 2]), bytes([0]) + bytes([2, 1, 0])]
    b = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(b"".join(idx_rows)))
        + chunk(b"IEND", b"")
    )
    out = png_decode(b)
    assert out is not None
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 0].tolist() == [0, 0, 255]


def test_features_stats():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, 4:] = 255  # left half black, right half white
    f = png_features(png_encode(img), grid=2)
    assert (f["width"], f["height"], f["channels"]) == (8, 8, 3)
    assert f["n_colors"] == 2
    assert f["brightness"] == pytest.approx(0.5, abs=0.01)
    # grid: [dark, bright, dark, bright]
    assert f["grid"][0] < 0.01 and f["grid"][1] > 0.99


def test_decode_rejects_non_png_and_unsupported():
    assert png_decode(b"\xff\xd8\xffjpegdata") is None
    assert png_features(b"not a png") is None


def test_image_features_operator(spark):
    from aden_hive_fork_spark.sources.binary import image_features

    img_a = png_encode(_gradient(10, 10))
    img_b = png_encode(np.full((5, 5, 3), 128, np.uint8))
    rows = spark.createDataFrame(
        [("a.png", bytearray(img_a)), ("a2.png", bytearray(img_a)),
         ("b.png", bytearray(img_b)), ("x.bin", bytearray(b"\x00\x01notimage"))],
        "path string, content binary",
    )
    out = {r["path"]: r for r in image_features(rows).collect()}
    assert out["a.png"]["decoded"] is True
    assert out["a.png"]["features"] == out["a2.png"]["features"]  # exact dup
    assert out["b.png"]["brightness"] == pytest.approx(128 / 255, abs=0.01)
    assert out["b.png"]["n_colors"] == 1
    assert out["x.bin"]["decoded"] is False and len(out["x.bin"]["features"]) == 16


def test_q81_image_dedup_groups(spark):
    from aden_hive_fork_spark.suite.multimodal import q81_image_dedup_features

    rows = q81_image_dedup_features(spark, "/root/testdata/sf0.001").collect()
    # 8 patterns x {PNG, JPEG} = 16 signature groups of 4 images each
    assert len(rows) == 16
    assert all(r["n_images"] == 4 for r in rows)
    assert all(r["width"] == 16 and r["channels"] == 3 for r in rows)
