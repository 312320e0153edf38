"""Driver-side data-file utilities — save / append / edit / load /
list with the reference's envelopes (tools/src/aden_tools/tools/
file_system_toolkits/data_tools/data_tools.py:23-377), completing §2.A
rows 32/33.

These are deliberately DRIVER-side: they manage small sidecar files
(spilled intermediates, report fragments, manifests) next to a
pipeline, not datasets. Dataset-scale IO goes through the distributed
sources (csv/parquet/binary); the reference draws the same line — its
data_tools operate on a local data_dir while table IO lives in the
csv/excel/postgres tools.

Envelope parity notes:
- filename validation rejects paths, '..' and backslashes with the
  reference's exact error text;
- ``edit_data`` enforces UNIQUE-match find-replace: zero matches and
  multi-matches are rejected with the reference's guidance strings —
  the same contract as a code-review "surgical diff" edit;
- ``load_data`` paginates by BYTE offset with O(1) seek and trims the
  chunk back to a valid UTF-8 boundary (scan-back ≤ 4 bytes), so a
  multi-byte character is never split across pages.
"""

from __future__ import annotations

import os

_INVALID = "Invalid filename. Use simple names like 'report.html'"


def _check(filename: str, data_dir: str) -> dict | None:
    if not filename or ".." in filename or "/" in filename or "\\" in filename:
        return {"error": _INVALID}
    if not data_dir:
        return {"error": "data_dir is required"}
    return None


def save_data(filename: str, data: str, data_dir: str) -> dict:
    """Write a whole file (reference data_tools.py:23-75)."""
    err = _check(filename, data_dir)
    if err:
        return err
    try:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, filename)
        with open(path, "w", encoding="utf-8") as f:
            f.write(data)
        return {
            "success": True,
            "filename": filename,
            "size_bytes": len(data.encode("utf-8")),
            "lines": data.count("\n") + 1,
            "preview": data[:200] + ("..." if len(data) > 200 else ""),
        }
    except Exception as e:
        return {"error": f"Failed to save data: {e}"}


def append_data(filename: str, data: str, data_dir: str) -> dict:
    """Append (create-if-missing) — reference data_tools.py:268-310."""
    err = _check(filename, data_dir)
    if err:
        return err
    try:
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, filename)
        with open(path, "a", encoding="utf-8") as f:
            f.write(data)
        return {
            "success": True,
            "filename": filename,
            "size_bytes": os.path.getsize(path),
            "appended_bytes": len(data.encode("utf-8")),
        }
    except Exception as e:
        return {"error": f"Failed to append data: {e}"}


def edit_data(filename: str, old_text: str, new_text: str, data_dir: str) -> dict:
    """Unique-match find-replace (reference data_tools.py:312-377).

    ``old_text`` must appear exactly once; zero or multiple occurrences
    reject the edit with actionable guidance, so a non-unique pattern
    can never silently edit the wrong site.
    """
    err = _check(filename, data_dir)
    if err:
        return err
    try:
        path = os.path.join(data_dir, filename)
        if not os.path.exists(path):
            return {"error": f"File not found: {filename}"}
        with open(path, "r", encoding="utf-8") as f:
            content = f.read()
        count = content.count(old_text)
        if count == 0:
            return {
                "error": (
                    "old_text not found in the file. "
                    "Make sure you're matching the exact text, "
                    "including whitespace and newlines."
                )
            }
        if count > 1:
            return {
                "error": (
                    f"old_text found {count} times — it must be unique. "
                    "Include more surrounding context to match exactly once."
                )
            }
        updated = content.replace(old_text, new_text, 1)
        with open(path, "w", encoding="utf-8") as f:
            f.write(updated)
        return {
            "success": True,
            "filename": filename,
            "size_bytes": len(updated.encode("utf-8")),
            "replacements": 1,
        }
    except Exception as e:
        return {"error": f"Failed to edit data: {e}"}


def load_data(
    filename: str,
    data_dir: str,
    offset_bytes: int = 0,
    limit_bytes: int = 10000,
) -> dict:
    """Byte-paginated read with UTF-8-safe boundaries (reference
    data_tools.py:67-170). O(1) seek — works unchanged on a file of
    any size."""
    err = _check(filename, data_dir)
    if err:
        return err
    try:
        offset_bytes, limit_bytes = int(offset_bytes), int(limit_bytes)
        path = os.path.join(data_dir, filename)
        if not os.path.exists(path):
            return {"error": f"File not found: {filename}"}
        file_size = os.path.getsize(path)
        if offset_bytes >= file_size:
            return {
                "success": True,
                "filename": filename,
                "content": "",
                "offset_bytes": offset_bytes,
                "bytes_read": 0,
                "next_offset_bytes": file_size,
                "file_size_bytes": file_size,
                "has_more": False,
            }
        with open(path, "rb") as f:
            f.seek(offset_bytes)
            raw = f.read(limit_bytes)
        text, chunk = None, raw
        for i in range(min(4, len(raw)) + 1):
            end = len(raw) - i if i > 0 else len(raw)
            try:
                text = raw[:end].decode("utf-8")
                chunk = raw[:end]
                break
            except UnicodeDecodeError:
                continue
        if text is None:
            return {"error": "Could not decode file as UTF-8"}
        if not chunk and raw:
            # limit_bytes is smaller than the next UTF-8 character: a
            # zero-progress page would loop a paginating caller forever
            return {
                "error": (
                    "limit_bytes too small for the next UTF-8 character "
                    "at this offset; increase limit_bytes (>= 4 always works)"
                )
            }
        next_offset = offset_bytes + len(chunk)
        return {
            "success": True,
            "filename": filename,
            "content": text,
            "offset_bytes": offset_bytes,
            "bytes_read": len(chunk),
            "next_offset_bytes": next_offset,
            "file_size_bytes": file_size,
            "has_more": next_offset < file_size,
        }
    except Exception as e:
        return {"error": f"Failed to load data: {e}"}


def list_data(data_dir: str) -> dict:
    """List data files with sizes (reference data_tools.py:230-266)."""
    if not data_dir:
        return {"error": "data_dir is required"}
    try:
        if not os.path.isdir(data_dir):
            return {"files": []}
        files = [
            {"filename": n, "size_bytes": os.path.getsize(os.path.join(data_dir, n))}
            for n in sorted(os.listdir(data_dir))
            if os.path.isfile(os.path.join(data_dir, n))
        ]
        return {"files": files}
    except Exception as e:
        return {"error": f"Failed to list data files: {e}"}
