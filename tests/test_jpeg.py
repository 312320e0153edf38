"""Baseline JPEG codec tests (sources/jpeg_codec.py).

The decoder is verified three independent ways:
1. a HAND-BUILT minimal JPEG byte stream (headers and entropy bits
   assembled manually in the test, not by the encoder) whose decoded
   pixels are analytically known — DC-only blocks decode to
   128 + DC·q/8 exactly;
2. analytic fixtures (solid color, gradients) where quantization
   behavior is predictable;
3. encoder↔decoder differential roundtrips at quality 100 across
   shapes, channel counts, subsampling, and restart intervals.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aden_hive_fork_spark.sources.jpeg_codec import (
    ZZ_FLAT,
    avi_info,
    avi_mjpeg_encode,
    avi_mjpeg_frames,
    jpeg_decode,
    jpeg_encode_baseline,
    jpeg_features,
)


# ---------------------------------------------------------------------------
# 1. hand-built stream — fully independent of the encoder
# ---------------------------------------------------------------------------
def _hand_built_dc_only(dc_quantized: int, q_dc: int = 16) -> bytes:
    """Construct an 8×8 grayscale baseline JPEG by hand: quant table
    with q[0]=q_dc (rest 1), canonical DC table (12 symbols, all 4-bit
    codes), AC table with only EOB (2-bit code '00'), and an entropy
    segment holding one DC coefficient + EOB, bit-assembled here."""
    q = bytes([q_dc] + [1] * 63)
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + q
    sof = b"\xff\xc0" + struct.pack(">H", 2 + 6 + 3) + bytes(
        [8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12)
        + b"\x00" + bytes(dc_bits) + bytes(range(12))
    )
    ac_bits = [0, 1] + [0] * 14
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1)
        + b"\x10" + bytes(ac_bits) + bytes([0x00])
    )
    sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes(
        [1, 1, 0x00, 0, 63, 0])

    # entropy bits, assembled by hand:
    #   DC: category s (4-bit code == s), then s magnitude bits
    #   AC: EOB ('00')
    v = dc_quantized
    s = abs(v).bit_length()
    bits = f"{s:04b}"
    if s:
        mag = v if v > 0 else v + (1 << s) - 1
        bits += format(mag, f"0{s}b")
    bits += "00"  # EOB
    bits += "1" * ((8 - len(bits) % 8) % 8)  # pad with 1s
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    # 0xFF byte stuffing (not hit for small DC values, but correct)
    data = data.replace(b"\xff", b"\xff\x00")
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + data + b"\xff\xd9"


@pytest.mark.parametrize("dc,q", [(8, 16), (-5, 16), (0, 16), (3, 32)])
def test_hand_built_dc_only_block(dc, q):
    """DC-only 8×8: every pixel is exactly 128 + dc·q/8 (the IDCT of a
    constant-coefficient block is flat) — hand-computable."""
    img = jpeg_decode(_hand_built_dc_only(dc, q))
    assert img is not None and img.shape == (8, 8, 1)
    expected = int(np.clip(round(128 + dc * q / 8), 0, 255))
    assert img.min() == img.max() == expected


def test_hand_built_single_ac_coefficient():
    """One AC coefficient (zigzag position 1 = F[0,1]): decoded rows
    must equal 128 + q·c·Aᵀ column profile — compare against a direct
    numpy IDCT, no codec code involved in the expectation."""
    # extend the hand-built stream: DC=0, then AC rs=0x01 (run 0,
    # size 1), magnitude bit '1' (+1), then EOB. AC table needs the
    # 0x01 symbol: use lengths {2: [EOB], 3: [0x01]}.
    q_dc, q_ac = 16, 24
    qtab = bytes([q_dc, q_ac] + [1] * 62)
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qtab
    sof = b"\xff\xc0" + struct.pack(">H", 2 + 6 + 3) + bytes(
        [8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    dht_dc = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12)
        + b"\x00" + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
    )
    dht_ac = (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 2)
        + b"\x10" + bytes([0, 1, 1] + [0] * 13) + bytes([0x00, 0x01])
    )
    sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes(
        [1, 1, 0x00, 0, 63, 0])
    # bits: DC cat 0 -> '0000'; AC symbol 0x01 -> len-3 code '010';
    # magnitude '1'; EOB -> '00'; pad
    bits = "0000" + "010" + "1" + "00"
    bits += "1" * ((8 - len(bits) % 8) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big")
    b = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + data + b"\xff\xd9"

    img = jpeg_decode(b)
    assert img is not None and img.shape == (8, 8, 1)
    # expectation from first principles: F[0,1] = q_ac, IDCT by numpy
    F = np.zeros((8, 8))
    F[0, 1] = q_ac
    A = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            A[k, n] = np.cos((2 * n + 1) * k * np.pi / 16) * (
                np.sqrt(1 / 8) if k == 0 else 0.5
            )
    want = np.clip(np.round(A.T @ F @ A) + 128, 0, 255).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], want)


def test_zigzag_order_is_the_standard_one():
    # spot-check the canonical T.81 sequence
    assert list(ZZ_FLAT[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZZ_FLAT) == list(range(64))


# ---------------------------------------------------------------------------
# 2. analytic fixtures
# ---------------------------------------------------------------------------
def test_solid_color_roundtrip_exact():
    for val in (0, 77, 130, 255):
        img = np.full((16, 24), val, np.uint8)
        out = jpeg_decode(jpeg_encode_baseline(img, quality=100))
        assert out.shape == (16, 24, 1)
        assert int(out.min()) == int(out.max())
        assert abs(int(out[0, 0, 0]) - val) <= 1  # DC quantization only


def test_solid_rgb_color_close():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:] = (200, 40, 90)
    out = jpeg_decode(jpeg_encode_baseline(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2  # color xform rounding


def test_gradient_brightness_is_analytic():
    """jpeg_features brightness of a horizontal luminance ramp equals
    the ramp mean within quantization tolerance."""
    x = np.tile(np.arange(0, 256, 4, dtype=np.uint8), (16, 1))  # 16×64 ramp
    b = jpeg_encode_baseline(x, quality=100)
    f = jpeg_features(b)
    assert f["width"] == 64 and f["height"] == 16 and f["channels"] == 1
    assert abs(f["brightness"] - float(x.mean()) / 255.0) < 0.01
    # grid cells increase monotonically along the ramp
    row = f["grid"][:4]
    assert row == sorted(row)


# ---------------------------------------------------------------------------
# 3. encoder↔decoder differential
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("shape", [(7, 5, 3), (9, 17, 3), (16, 16, 3), (1, 1, 3), (40, 56, 3)])
def test_rgb_roundtrip_q100(shape):
    img = np.random.RandomState(7).randint(0, 256, shape, np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(img, quality=100))
    assert out.shape == shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_grayscale_roundtrip_exact_q100():
    img = np.random.RandomState(8).randint(0, 256, (24, 31), np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(img, quality=100))
    # no color transform, quant all-ones: only DCT float rounding
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_subsampled_smooth_image_close():
    y, x = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], -1
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(img, quality=95, subsample=True))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0


def test_restart_markers_do_not_change_pixels():
    img = np.random.RandomState(9).randint(0, 256, (32, 48, 3), np.uint8)
    plain = jpeg_decode(jpeg_encode_baseline(img, quality=85))
    for ri in (1, 2, 5):
        with_rst = jpeg_decode(
            jpeg_encode_baseline(img, quality=85, restart_interval=ri)
        )
        assert np.array_equal(plain, with_rst)
    sub = jpeg_decode(jpeg_encode_baseline(img, quality=85, subsample=True))
    sub_rst = jpeg_decode(
        jpeg_encode_baseline(img, quality=85, subsample=True, restart_interval=2)
    )
    assert np.array_equal(sub, sub_rst)


def test_byte_stuffing_roundtrip():
    """An image tuned to emit 0xFF bytes in the entropy stream must
    still roundtrip (stuffing + destuffing)."""
    img = np.random.RandomState(11).randint(0, 256, (64, 64, 3), np.uint8)
    b = jpeg_encode_baseline(img, quality=100)
    assert b"\xff\x00" in b  # stuffing actually occurred at this size
    out = jpeg_decode(b)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_decoder_rejects_garbage_and_progressive():
    assert jpeg_decode(b"not a jpeg") is None
    assert jpeg_decode(b"\xff\xd8\xff\xe0junk") is None
    # progressive SOF2 is declared out of scope, not mis-decoded
    img = np.full((8, 8), 100, np.uint8)
    b = bytearray(jpeg_encode_baseline(img, quality=90))
    b[b.index(b"\xff\xc0") + 1] = 0xC2
    assert jpeg_decode(bytes(b)) is None


# ---------------------------------------------------------------------------
# MJPEG/AVI container
# ---------------------------------------------------------------------------
def test_avi_roundtrip_and_info():
    frames = [
        jpeg_encode_baseline(np.full((8, 8, 3), c, np.uint8), quality=100)
        for c in (10, 120, 240)
    ]
    avi = avi_mjpeg_encode(frames, fps=5)
    assert avi_mjpeg_frames(avi) == frames
    dur, w, h = avi_info(avi)
    assert (w, h) == (8, 8)
    assert dur == pytest.approx(0.6)
    assert avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00AVI ") == []
    assert avi_mjpeg_frames(b"garbage") == []


def test_avi_frame_pixels_decode():
    vals = (20, 20, 200)  # frame 0 and 1 identical, frame 2 differs
    frames = [
        jpeg_encode_baseline(np.full((16, 16, 3), v, np.uint8), quality=100)
        for v in vals
    ]
    back = avi_mjpeg_frames(avi_mjpeg_encode(frames, fps=10))
    decoded = [jpeg_decode(f) for f in back]
    assert np.array_equal(decoded[0], decoded[1])
    assert not np.array_equal(decoded[0], decoded[2])
    assert abs(int(decoded[2][0, 0, 0]) - 200) <= 2


def test_q112_cross_codec_neardup_clusters(spark):
    """End-to-end: decoded-pixel features from two codecs and three
    JPEG settings cluster per pattern — exactly 8 clusters of 4."""
    from aden_hive_fork_spark.suite.multimodal import q112_image_neardup_clusters

    rows = q112_image_neardup_clusters(spark, "/root/testdata/sf0.001").collect()
    assert [(r.cluster_rep, r.n_members) for r in rows] == [
        (i, 4) for i in range(8)
    ]
