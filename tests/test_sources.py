"""Source/sink tests in the reference's fixture style
(tools/tests/tools/test_csv_tool.py / test_excel_tool.py patterns)."""

from __future__ import annotations

import struct

import pytest

from aden_hive_fork_spark.sources import (
    csv_append,
    csv_info,
    csv_read,
    csv_sql,
    csv_write,
    excel_sql_frames,
    extract_metadata,
    fake_features,
    grep_files,
    read_binary_dir,
    read_jsonl,
)
from aden_hive_fork_spark.sources.excel_source import search_predicate


@pytest.fixture()
def people_csv(tmp_path):
    # the reference's canonical fixture (test_csv_tool.py:49-52)
    p = tmp_path / "people.csv"
    p.write_text("name,age,city\nAlice,30,NYC\nBob,25,LA\nCharlie,35,Chicago\n")
    return str(p)


def test_csv_read_all_strings(spark, people_csv):
    res = csv_read(spark, people_csv)
    assert res["success"] and res["total_rows"] == 3
    assert res["rows"][0] == {"name": "Alice", "age": "30", "city": "NYC"}  # strings!


def test_csv_read_limit_offset(spark, people_csv):
    res = csv_read(spark, people_csv, limit=1, offset=1)
    assert res["row_count"] == 1
    assert res["rows"][0]["name"] == "Bob"
    assert res["total_rows"] == 3


def test_csv_sql_typed(spark, people_csv):
    # golden results from the reference tests (test_excel_tool.py:847-869)
    res = csv_sql(spark, people_csv, "SELECT name FROM data WHERE age > 25 ORDER BY name")
    assert [r["name"] for r in res["rows"]] == ["Alice", "Charlie"]
    res = csv_sql(spark, people_csv, "SELECT COUNT(*) AS n, AVG(age) AS avg_age FROM data")
    assert res["rows"][0]["n"] == 3 and res["rows"][0]["avg_age"] == 30.0


def test_csv_sql_blocks_writes(spark, people_csv):
    from aden_hive_fork_spark.guard import SqlGuardError

    with pytest.raises(SqlGuardError):
        csv_sql(spark, people_csv, "DELETE FROM data")


def test_csv_write_append_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    r = csv_write(spark, out, ["a", "b"], [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}])
    assert r["success"] and r["rows_written"] == 2
    r = csv_append(spark, out, [{"a": "3", "b": "z"}])
    assert r["success"]
    res = csv_read(spark, out)
    assert res["total_rows"] == 3
    assert {row["a"] for row in res["rows"]} == {"1", "2", "3"}
    r = csv_append(spark, out, [{"nope": "1"}])
    assert not r["success"] and "unknown columns" in r["error"]


def test_csv_info(spark, people_csv):
    res = csv_info(spark, people_csv)
    assert res["columns"] == ["name", "age", "city"]
    assert res["row_count"] == 3 and res["size_bytes"] > 0


def test_excel_sql_frames_join(spark):
    # multi-sheet join (reference excel_tool.py:508 docstring example)
    sales = spark.createDataFrame(
        [(1, 2, 100.0), (2, 1, 50.0)], "product_id int, qty int, amount double"
    )
    products = spark.createDataFrame([(1, "Widget"), (2, "Gadget")], "id int, name string")
    res = excel_sql_frames(
        spark,
        {"Sales": sales, "Products": products},
        "SELECT s.qty, p.name FROM Sales s JOIN Products p ON s.product_id = p.id ORDER BY p.name",
    )
    assert res["success"]
    assert [(r["qty"], r["name"]) for r in res["rows"]] == [(1, "Gadget"), (2, "Widget")]
    # target sheet aliased as `data`
    res = excel_sql_frames(spark, {"Sales": sales}, "SELECT COUNT(*) AS n FROM data")
    assert res["rows"][0]["n"] == 2


def test_search_predicate_modes(spark):
    df = spark.createDataFrame([("Alpha", "x"), ("beta", "Alp")], "a string, b string")
    assert df.filter(search_predicate(["a", "b"], "alp", "starts_with")).count() == 2
    assert df.filter(search_predicate(["a"], "Alpha", "exact", case_insensitive=False)).count() == 1
    assert df.filter(search_predicate(["a", "b"], "et", "contains")).count() == 1
    assert df.filter(search_predicate(["a"], "ha", "ends_with")).count() == 1


def test_read_jsonl_skips_corrupt(spark, tmp_path):
    p = tmp_path / "log.jsonl"
    p.write_text('{"a": 1}\nnot json at all\n{"a": 3}\n')
    df = read_jsonl(spark, str(p), schema="a long")
    assert sorted(r.a for r in df.collect()) == [1, 3]


def test_grep_files(spark, tmp_path):
    (tmp_path / "x.txt").write_text("hello world\nnothing\nHELLO again\n")
    out = grep_files(spark, str(tmp_path / "*.txt"), "hello", case_insensitive=True).collect()
    assert sorted(r.line_number for r in out) == [1, 3]
    out = grep_files(spark, str(tmp_path / "*.txt"), "hello").collect()
    assert len(out) == 1


@pytest.fixture()
def asset_dir(tmp_path):
    # minimal real containers, built from the public format specs
    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + struct.pack(">IIBBBBB", 64, 48, 8, 2, 0, 0, 0) + b"\x00" * 8
    )
    gif = b"GIF89a" + struct.pack("<HH", 10, 20) + b"\x00" * 6
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    )
    (tmp_path / "a.png").write_bytes(png)
    (tmp_path / "b.gif").write_bytes(gif)
    (tmp_path / "c.wav").write_bytes(wav)
    return str(tmp_path)


def test_binary_metadata(spark, asset_dir):
    df = read_binary_dir(spark, asset_dir)
    meta = {r.mime: r for r in extract_metadata(df).collect()}
    assert meta["image/png"].width == 64 and meta["image/png"].height == 48
    assert meta["image/gif"].width == 10 and meta["image/gif"].height == 20
    assert meta["audio/wav"].sample_rate == 44100 and meta["audio/wav"].channels == 2
    assert all(len(r.sha256) == 64 for r in meta.values())


def test_fake_features_deterministic(spark, asset_dir):
    df = read_binary_dir(spark, asset_dir)
    f1 = {r.path: r.features for r in fake_features(df).collect()}
    f2 = {r.path: r.features for r in fake_features(df).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())


def test_strict_mode_requires_real_decode_path(spark):
    # MP4 content with neither backend nor placeholder tier allowed →
    # the task raises a loud, actionable error
    from aden_hive_fork_spark.sources.binary import video_frame_sample

    mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64
    df = spark.createDataFrame([("a.mp4", bytearray(mp4))],
                               "path string, content binary")
    with pytest.raises(Exception, match="ffmpeg"):
        video_frame_sample(df, use_stub_decoder=False).collect()


def _make_pdf(pages_text, compress=False):
    """Build a minimal valid-enough PDF with one content stream per page."""
    import zlib as _zlib

    parts = [b"%PDF-1.4\n"]
    for i, text in enumerate(pages_text):
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        content = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
        if compress:
            payload = _zlib.compress(content)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(payload)
        else:
            payload = content
            head = b"<< /Length %d >>" % len(payload)
        parts.append(
            b"%d 0 obj\n" % (i + 10) + head + b"\nstream\n" + payload + b"\nendstream\nendobj\n"
        )
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def test_pdf_extract_pages_plain():
    from aden_hive_fork_spark.sources.pdf_source import pdf_extract_pages

    pdf = _make_pdf(["Hello PDF", "Second (page)", "Third"])
    got = pdf_extract_pages(pdf)
    assert got == [(1, "Hello PDF"), (2, "Second (page)"), (3, "Third")]
    assert pdf_extract_pages(pdf, pages="1-2") == got[:2]
    assert pdf_extract_pages(pdf, pages="3,1") == [(3, "Third"), (1, "Hello PDF")]
    assert pdf_extract_pages(pdf, pages="2-99") == got[1:]


def test_pdf_extract_flate_and_tj_array():
    from aden_hive_fork_spark.sources.pdf_source import pdf_extract_pages

    pdf = _make_pdf(["Compressed text here"], compress=True)
    assert pdf_extract_pages(pdf) == [(1, "Compressed text here")]
    # TJ array form with kerning numbers
    import zlib as _zlib
    content = b"BT [(Ker) -120 (ned)] TJ ET"
    pdf2 = (b"%%PDF-1.4\n10 0 obj\n<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream\nendobj\n%EOF")
    assert pdf_extract_pages(pdf2) == [(1, "Kerned")]


def test_pdf_read_distributed(spark, tmp_path):
    from aden_hive_fork_spark.sources.pdf_source import pdf_read

    (tmp_path / "a.pdf").write_bytes(_make_pdf(["doc A page one", "doc A page two"]))
    (tmp_path / "b.pdf").write_bytes(_make_pdf(["doc B only"], compress=True))
    df = read_binary_dir(spark, str(tmp_path), glob="*.pdf")
    rows = {(r.path.rsplit("/", 1)[-1], r.page): r.text for r in pdf_read(df).collect()}
    assert rows[("a.pdf", 1)] == "doc A page one"
    assert rows[("a.pdf", 2)] == "doc A page two"
    assert rows[("b.pdf", 1)] == "doc B only"
    only_p2 = pdf_read(df, pages="2").collect()
    assert len(only_p2) == 1 and only_p2[0].page == 2


def test_wav_pcm_windows_sine(spark, tmp_path):
    import math
    import wave as wavmod

    from aden_hive_fork_spark.sources.binary import wav_pcm_windows

    # 1 s of a 440 Hz sine at amplitude 0.5, 8 kHz mono PCM16
    rate, amp = 8000, 0.5
    path = tmp_path / "tone.wav"
    with wavmod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<h", int(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate))
            )
            for i in range(rate)
        )
        w.writeframes(frames)

    df = read_binary_dir(spark, str(tmp_path), glob="*.wav")
    rows = wav_pcm_windows(df, window_s=0.25).orderBy("window_idx").collect()
    assert len(rows) == 4  # 1 s / 0.25 s windows
    assert all(r.n_samples == 2000 for r in rows)
    for r in rows:
        # sine RMS = amp/sqrt(2), peak ≈ amp
        assert abs(r.rms - amp / math.sqrt(2)) < 0.01
        assert abs(r.peak - amp) < 0.01
    assert [r.start_s for r in rows] == [0.0, 0.25, 0.5, 0.75]


def test_wav_pcm_windows_skips_non_wav(spark, asset_dir):
    from aden_hive_fork_spark.sources.binary import wav_pcm_windows

    df = read_binary_dir(spark, asset_dir)
    rows = wav_pcm_windows(df).collect()
    # header-only wav fixture has no data chunk; png/gif skipped
    assert rows == []


def test_video_frame_sample_deterministic(spark, asset_dir):
    from aden_hive_fork_spark.sources.binary import video_frame_sample

    df = read_binary_dir(spark, asset_dir)
    f1 = video_frame_sample(df, every_s=1.0, max_frames=3).orderBy(
        "path", "frame_idx"
    ).collect()
    f2 = video_frame_sample(df, every_s=1.0, max_frames=3).orderBy(
        "path", "frame_idx"
    ).collect()
    assert [tuple(r) for r in f1] == [tuple(r) for r in f2]
    assert all(r.frame_idx < 3 for r in f1)
    assert len({r.frame_sha256 for r in f1}) == len(f1)  # per-frame unique

    with pytest.raises(Exception):  # stub decoder path raises
        video_frame_sample(df, use_stub_decoder=False).collect()


# ---------------------------------------------------------------------------
# HTML -> text extraction (web_scrape scan side)
# ---------------------------------------------------------------------------
_HTML = """<html><head><title>My  Page</title>
<style>body { color: red }</style></head>
<body><h1>Header</h1><p>First para with <a href="/x">a link</a>.</p>
<script>var ignored = "script text";</script>
<div>Second <b>bold</b> block</div>
<ul><li>item one</li><li>item two</li></ul>
</body></html>"""


def test_html_to_text_pure():
    from aden_hive_fork_spark.sources.html_source import (
        html_link_count,
        html_title,
        html_to_text,
    )

    text = html_to_text(_HTML)
    assert "Header" in text and "First para with a link." in text
    assert "Second bold block" in text
    assert "item one" in text and "item two" in text
    assert "ignored" not in text and "color: red" not in text
    assert html_title(_HTML) == "My Page"
    assert html_link_count(_HTML) == 1
    assert html_to_text("") == "" and html_to_text(None) == ""


def test_html_scrape_columns_distributed(spark):
    from aden_hive_fork_spark.sources.html_source import scrape_columns

    df = spark.createDataFrame(
        [(1, _HTML), (2, "<p>plain</p>"), (3, "not html at all")],
        "page_id long, html string",
    )
    rows = {
        r.page_id: r
        for r in df.select("page_id", *scrape_columns("html")).collect()
    }
    assert rows[1].title == "My Page" and rows[1].n_links == 1
    assert "Header" in rows[1].text
    assert rows[2].text == "plain" and rows[2].title == ""
    assert rows[3].text == "not html at all"  # pass-through for non-HTML


def test_pdf_write_roundtrip_escapes():
    from aden_hive_fork_spark.sources.pdf_source import pdf_extract_pages, pdf_write
    import tempfile, os

    texts = ["plain text", "parens (and) \\ backslash", "tab\there"]
    p = os.path.join(tempfile.mkdtemp(), "rt.pdf")
    out = pdf_write(p, texts)
    assert out["success"] and out["pages"] == 3
    raw = open(p, "rb").read()
    assert raw.startswith(b"%PDF-1.4") and b"startxref" in raw
    assert [t for _, t in pdf_extract_pages(raw)] == texts


def _mini_mp4(duration_s=7.5, timescale=1000, width=640, height=360) -> bytes:
    """Hand-built minimal ISO BMFF: ftyp + moov(mvhd + trak(tkhd))."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd = (
        b"\x00" + b"\x00\x00\x00"          # version 0 + flags
        + b"\x00" * 8                       # creation/modification
        + struct.pack(">I", timescale)
        + struct.pack(">I", int(duration_s * timescale))
        + b"\x00" * 80                      # rate/volume/matrix/etc
    )
    tkhd = (
        b"\x00" + b"\x00\x00\x0f"          # version 0 + flags
        + b"\x00" * 72                      # ids, times, layer, matrix
        + struct.pack(">I", width << 16)    # 16.16 fixed at offset 76
        + struct.pack(">I", height << 16)
    )
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + box(b"mdat", b"\x00" * 256)


def test_mp4_header_metadata(spark):
    from aden_hive_fork_spark.sources.binary import extract_metadata, mp4_info, sniff_mime

    b = _mini_mp4()
    assert sniff_mime(b) == "video/mp4"
    dur, w, h = mp4_info(b)
    assert dur == 7.5 and w == 640 and h == 360
    df = spark.createDataFrame([("v.mp4", bytearray(b))], "path string, content binary")
    row = extract_metadata(df).collect()[0]
    assert row["mime"] == "video/mp4"
    assert row["duration_s"] == 7.5
    assert (row["width"], row["height"]) == (640, 360)


def test_video_frame_sample_uses_real_duration(spark):
    from aden_hive_fork_spark.sources.binary import video_frame_sample

    df = spark.createDataFrame(
        [("v.mp4", bytearray(_mini_mp4(duration_s=3.0)))], "path string, content binary"
    )
    rows = video_frame_sample(df, every_s=1.0, max_frames=16).collect()
    # 3.0 s clip at 1 fps sampling -> 4 frames (t = 0,1,2,3)
    assert len(rows) == 4
    assert sorted(r["ts_s"] for r in rows) == [0.0, 1.0, 2.0, 3.0]
    assert len({r["frame_sha256"] for r in rows}) == 4  # per-frame fingerprints


def test_image_features_decodes_jpeg(spark):
    """image_features must REAL-decode JPEG content (decoded=true with
    pixel-accurate brightness), same contract as the PNG tier."""
    import numpy as np

    from aden_hive_fork_spark.sources.binary import image_features
    from aden_hive_fork_spark.sources.jpeg_codec import jpeg_encode_baseline

    solid = jpeg_encode_baseline(np.full((16, 16, 3), 100, np.uint8), quality=100)
    grad = jpeg_encode_baseline(
        np.tile(np.arange(0, 256, 16, dtype=np.uint8), (16, 1)), quality=100
    )
    df = spark.createDataFrame(
        [("a.jpg", bytearray(solid)), ("b.jpg", bytearray(grad))],
        "path string, content binary",
    )
    rows = {r.path: r for r in image_features(df).collect()}
    assert rows["a.jpg"].decoded and rows["b.jpg"].decoded
    assert rows["a.jpg"].width == 16 and rows["a.jpg"].channels == 3
    assert abs(rows["a.jpg"].brightness - 100 / 255) < 0.02
    assert rows["a.jpg"].contrast < 0.02       # solid: no variance
    assert rows["b.jpg"].contrast > 0.2        # ramp: high variance


def test_video_frame_sample_real_mjpeg_frames(spark):
    """AVI/MJPEG clips sample REAL frames: fingerprints are of the
    actual frame bytes, so identical frames collide across clips."""
    import numpy as np

    from aden_hive_fork_spark.sources.binary import video_frame_sample
    from aden_hive_fork_spark.sources.jpeg_codec import (
        avi_mjpeg_encode,
        jpeg_encode_baseline,
    )

    shared = jpeg_encode_baseline(np.full((8, 8, 3), 60, np.uint8), quality=100)
    other = jpeg_encode_baseline(np.full((8, 8, 3), 200, np.uint8), quality=100)
    avi1 = avi_mjpeg_encode([shared, other], fps=4)
    avi2 = avi_mjpeg_encode([shared], fps=4)
    df = spark.createDataFrame(
        [("one.avi", bytearray(avi1)), ("two.avi", bytearray(avi2))],
        "path string, content binary",
    )
    rows = video_frame_sample(df, every_s=0.25, max_frames=8).collect()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r.path, {})[r.frame_idx] = r.frame_sha256
    assert by_clip["one.avi"][0] == by_clip["two.avi"][0]  # same frame bytes
    assert by_clip["one.avi"][0] != by_clip["one.avi"][1]


def test_mjpeg_frame_features_pixels(spark):
    """Per-frame decoded brightness tracks the analytic gray levels of
    the synthesized frames."""
    import numpy as np

    from aden_hive_fork_spark.sources.binary import mjpeg_frame_features
    from aden_hive_fork_spark.sources.jpeg_codec import (
        avi_mjpeg_encode,
        jpeg_encode_baseline,
    )

    frames = [
        jpeg_encode_baseline(np.full((16, 16, 3), v, np.uint8), quality=100)
        for v in (50, 150, 250)
    ]
    df = spark.createDataFrame(
        [("c.avi", bytearray(avi_mjpeg_encode(frames, fps=4)))],
        "path string, content binary",
    )
    rows = sorted(
        mjpeg_frame_features(df, every_s=0.25, max_frames=8).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.decoded for r in rows] == [True, True, True]
    assert [r.width for r in rows] == [16, 16, 16]
    got = [r.brightness for r in rows]
    for b, want in zip(got, (50 / 255, 150 / 255, 250 / 255)):
        assert abs(b - want) < 0.02


def test_avi_metadata_extraction(spark):
    import numpy as np

    from aden_hive_fork_spark.sources.binary import extract_metadata
    from aden_hive_fork_spark.sources.jpeg_codec import (
        avi_mjpeg_encode,
        jpeg_encode_baseline,
    )

    frames = [
        jpeg_encode_baseline(np.full((12, 20, 3), 99, np.uint8), quality=95)
    ] * 4
    df = spark.createDataFrame(
        [("m.avi", bytearray(avi_mjpeg_encode(frames, fps=8)))],
        "path string, content binary",
    )
    r = extract_metadata(df).collect()[0]
    assert r.mime == "video/x-msvideo"
    assert (r.width, r.height) == (20, 12)
    assert abs(r.duration_s - 0.5) < 1e-6
