"""EXIF parsing from handcrafted JPEG APP1 segments — both TIFF byte
orders, sub-IFD and GPS pointers, and the distributed projection."""

from __future__ import annotations

import struct

from aden_hive_fork_spark.sources.binary import exif_info, exif_metadata

# fixed layout: header(8) + IFD0(2+6*12+4=78) + ExifIFD(2+4*12+4=54)
# + GPSIFD(54) = 194, data area after
_IFD0_OFF, _EXIF_OFF, _GPS_OFF, _DATA_OFF = 8, 86, 140, 194


def build_exif_jpeg(en: str = "<") -> bytes:
    order = b"II" if en == "<" else b"MM"
    data = bytearray()

    def put(payload: bytes) -> int:
        off = _DATA_OFF + len(data)
        data.extend(payload)
        return off

    def val_ascii(s: str) -> tuple[int, bytes]:
        b = s.encode() + b"\x00"
        if len(b) <= 4:
            return len(b), b.ljust(4, b"\x00")
        return len(b), struct.pack(en + "I", put(b))

    def val_rationals(pairs: list[tuple[int, int]]) -> tuple[int, bytes]:
        payload = b"".join(struct.pack(en + "II", n, d) for n, d in pairs)
        return len(pairs), struct.pack(en + "I", put(payload))

    def e(tag: int, etype: int, count: int, val4: bytes) -> bytes:
        return struct.pack(en + "HHI", tag, etype, count) + val4

    def ifd(entries: list[bytes]) -> bytes:
        return (
            struct.pack(en + "H", len(entries))
            + b"".join(entries)
            + struct.pack(en + "I", 0)
        )

    n, v = val_ascii("Acme")
    make = e(0x010F, 2, n, v)
    n, v = val_ascii("Cam 9000")
    model = e(0x0110, 2, n, v)
    orientation = e(0x0112, 3, 1, struct.pack(en + "H", 6).ljust(4, b"\x00"))
    n, v = val_ascii("2024:03:01 10:00:00")
    dt = e(0x0132, 2, n, v)
    exif_ptr = e(0x8769, 4, 1, struct.pack(en + "I", _EXIF_OFF))
    gps_ptr = e(0x8825, 4, 1, struct.pack(en + "I", _GPS_OFF))
    ifd0 = ifd([make, model, orientation, dt, exif_ptr, gps_ptr])

    n, v = val_rationals([(1, 250)])
    exposure = e(0x829A, 5, n, v)
    n, v = val_rationals([(28, 10)])
    fnum = e(0x829D, 5, n, v)
    iso = e(0x8827, 3, 1, struct.pack(en + "H", 200).ljust(4, b"\x00"))
    n, v = val_ascii("2024:03:01 10:00:01")
    dto = e(0x9003, 2, n, v)
    exif_ifd = ifd([exposure, fnum, iso, dto])

    n, v = val_ascii("N")
    latref = e(0x0001, 2, n, v)
    n, v = val_rationals([(47, 1), (22, 1), (30, 1)])
    lat = e(0x0002, 5, n, v)
    n, v = val_ascii("E")
    lonref = e(0x0003, 2, n, v)
    n, v = val_rationals([(8, 1), (33, 1), (0, 1)])
    lon = e(0x0004, 5, n, v)
    gps_ifd = ifd([latref, lat, lonref, lon])

    tiff = (
        order
        + struct.pack(en + "H", 42)
        + struct.pack(en + "I", _IFD0_OFF)
        + ifd0
        + exif_ifd
        + gps_ifd
        + bytes(data)
    )
    assert tiff.index(ifd0) == _IFD0_OFF and len(tiff) >= _DATA_OFF
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )


def _check(info):
    assert info["make"] == "Acme"
    assert info["model"] == "Cam 9000"
    assert info["orientation"] == 6
    assert info["datetime"] == "2024:03:01 10:00:00"
    assert info["datetime_original"] == "2024:03:01 10:00:01"
    assert info["exposure_time"] == 1 / 250
    assert info["f_number"] == 2.8
    assert info["iso"] == 200
    assert info["gps_lat"] == 47.375
    assert info["gps_lon"] == 8.55


def test_exif_little_endian():
    _check(exif_info(build_exif_jpeg("<")))


def test_exif_big_endian():
    _check(exif_info(build_exif_jpeg(">")))


def test_exif_absent_or_garbage():
    assert exif_info(b"\xff\xd8\xff\xd9") is None  # JPEG without APP1
    assert exif_info(b"\x89PNG\r\n\x1a\nrest") is None  # not a JPEG
    truncated = build_exif_jpeg("<")[:40]
    assert exif_info(truncated) in (None, {}) or isinstance(
        exif_info(truncated), dict
    )  # must not raise


def test_exif_metadata_distributed(spark):
    rows = [
        ("a.jpg", bytearray(build_exif_jpeg("<"))),
        ("b.jpg", bytearray(build_exif_jpeg(">"))),
        ("c.png", bytearray(b"\x89PNG\r\n\x1a\nnotjpeg")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary").repartition(3)
    got = {r["path"]: r for r in exif_metadata(df).collect()}
    for p in ("a.jpg", "b.jpg"):
        assert got[p]["make"] == "Acme"
        assert got[p]["iso"] == 200
        assert got[p]["gps_lat"] == 47.375
        assert got[p]["datetime_original"] == "2024:03:01 10:00:01"
    assert got["c.png"]["make"] is None and got["c.png"]["gps_lat"] is None

# ---------------------------------------------------------------------------
# Fuzz: the parser ingests untrusted bytes on executors — it must
# never raise, only return None/partial dicts.
# ---------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_exif_never_raises_on_garbage(blob):
    exif_info(blob)
    exif_info(b"\xff\xd8" + blob)  # garbage wearing a JPEG SOI


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 255))
def test_exif_never_raises_on_mutated_valid(pos, byte):
    b = bytearray(build_exif_jpeg("<"))
    b[pos % len(b)] = byte  # single-byte corruption anywhere
    exif_info(bytes(b))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=200))
def test_exif_never_raises_on_truncation(n):
    exif_info(build_exif_jpeg(">")[:n])
