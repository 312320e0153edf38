"""Driver-side data tools (sources/data_tools) — envelope parity with
the reference (data_tools.py:23-377), in its per-tool golden style.
The unique-match edit contract and UTF-8-safe byte pagination are the
load-bearing behaviors."""

from __future__ import annotations

from aden_hive_fork_spark.sources.data_tools import (
    append_data,
    edit_data,
    list_data,
    load_data,
    save_data,
)


def test_filename_validation(tmp_path):
    d = str(tmp_path)
    for bad in ("", "../x", "a/b", "a\\b"):
        assert "Invalid filename" in save_data(bad, "x", d)["error"]
    assert edit_data("x.txt", "a", "b", "")["error"] == "data_dir is required"


def test_save_envelope(tmp_path):
    out = save_data("r.txt", "line1\nline2", str(tmp_path))
    assert out["success"] and out["lines"] == 2
    assert out["size_bytes"] == len(b"line1\nline2")
    assert out["preview"] == "line1\nline2"
    long = save_data("l.txt", "x" * 300, str(tmp_path))
    assert long["preview"].endswith("...") and len(long["preview"]) == 203


def test_append_creates_and_accumulates(tmp_path):
    d = str(tmp_path)
    a = append_data("log.txt", "abc", d)
    assert a["success"] and a["appended_bytes"] == 3 and a["size_bytes"] == 3
    b = append_data("log.txt", "def", d)
    assert b["size_bytes"] == 6


def test_edit_unique_match(tmp_path):
    d = str(tmp_path)
    save_data("doc.html", "<h1>PLACEHOLDER</h1><p>keep</p>", d)
    out = edit_data("doc.html", "PLACEHOLDER", "Title", d)
    assert out == {
        "success": True,
        "filename": "doc.html",
        "size_bytes": len(b"<h1>Title</h1><p>keep</p>"),
        "replacements": 1,
    }
    assert load_data("doc.html", d)["content"] == "<h1>Title</h1><p>keep</p>"


def test_edit_rejects_zero_and_multi(tmp_path):
    d = str(tmp_path)
    save_data("doc.txt", "aa bb aa", d)
    zero = edit_data("doc.txt", "zz", "x", d)
    assert "not found" in zero["error"]
    multi = edit_data("doc.txt", "aa", "x", d)
    assert "found 2 times" in multi["error"] and "unique" in multi["error"]
    # file unchanged after both rejections
    assert load_data("doc.txt", d)["content"] == "aa bb aa"
    missing = edit_data("ghost.txt", "a", "b", d)
    assert missing["error"] == "File not found: ghost.txt"


def test_load_pagination_and_utf8_boundary(tmp_path):
    d = str(tmp_path)
    # 3-byte snowman characters: a 4-byte page would split one
    save_data("u.txt", "☃" * 10, d)
    page = load_data("u.txt", d, offset_bytes=0, limit_bytes=4)
    assert page["content"] == "☃" and page["bytes_read"] == 3
    nxt = load_data("u.txt", d, offset_bytes=page["next_offset_bytes"], limit_bytes=6)
    assert nxt["content"] == "☃☃" and nxt["has_more"]
    past = load_data("u.txt", d, offset_bytes=999)
    assert past["content"] == "" and past["has_more"] is False


def test_list_data(tmp_path):
    d = str(tmp_path)
    assert list_data(str(tmp_path / "none")) == {"files": []}
    save_data("a.txt", "xy", d)
    save_data("b.txt", "z", d)
    out = list_data(d)
    assert out["files"] == [
        {"filename": "a.txt", "size_bytes": 2},
        {"filename": "b.txt", "size_bytes": 1},
    ]


def test_load_rejects_zero_progress_page(tmp_path):
    """limit_bytes smaller than one UTF-8 char must error, not return
    an empty page with has_more=True (infinite pagination loop) —
    review finding r3."""
    d = str(tmp_path)
    save_data("jp.txt", "日本語", d)
    out = load_data("jp.txt", d, offset_bytes=0, limit_bytes=2)
    assert "limit_bytes too small" in out["error"]
    ok = load_data("jp.txt", d, offset_bytes=0, limit_bytes=4)
    assert ok["content"] == "日" and ok["bytes_read"] == 3
