"""Sandboxed file tools — view / list / write / replace / patch with
the reference's envelopes (tools/src/aden_tools/tools/
file_system_toolkits/{view_file,list_dir,write_to_file,
replace_file_content,apply_patch}), completing the file-toolkit
family around ``data_tools``.

The reference confines every path to a per-session sandbox via
``get_secure_path`` (file_system_toolkits/security.py); here the
sandbox root is an explicit ``root`` argument and ``_secure`` rejects
absolute paths and ``..`` escapes — same guarantee, no ambient
session context.

``apply_patch`` applies a UNIFIED diff with strict context
verification (the reference delegates to diff-match-patch, which is
not in this environment; unified diff is the interchange format
``difflib.unified_diff`` emits, so patches round-trip within the
stdlib). A hunk whose context does not match is rejected and the file
is left untouched — partial application never happens.
"""

from __future__ import annotations

import os
import re


def _secure(root: str, path: str) -> str | None:
    """Resolve ``path`` inside ``root``; None if it escapes."""
    if os.path.isabs(path):
        return None
    full = os.path.realpath(os.path.join(root, path))
    rootr = os.path.realpath(root)
    if full == rootr or full.startswith(rootr + os.sep):
        return full
    return None


def view_file(
    path: str,
    root: str,
    encoding: str = "utf-8",
    max_size: int = 10 * 1024 * 1024,
) -> dict:
    """Read a file (view_file.py:15-74 envelope: content + size +
    line count, truncation marker past max_size)."""
    try:
        if max_size < 0:
            return {"error": f"max_size must be non-negative, got {max_size}"}
        p = _secure(root, path)
        if p is None:
            return {"error": f"Path escapes the sandbox: {path}"}
        if not os.path.exists(p):
            return {"error": f"File not found at {path}"}
        if not os.path.isfile(p):
            return {"error": f"Path is not a file: {path}"}
        with open(p, encoding=encoding) as f:
            content = f.read()
        raw = content.encode(encoding)
        if len(raw) > max_size:
            # truncate by BYTES against the byte budget (a char slice
            # overshoots up to 4x on multi-byte text), snapping back to
            # a decodable boundary
            cut = raw[:max_size]
            for back in range(4):
                try:
                    content = cut[: len(cut) - back if back else len(cut)].decode(
                        encoding
                    )
                    break
                except UnicodeDecodeError:
                    continue
            else:
                content = cut.decode(encoding, "ignore")
            content += "\n\n[... Content truncated due to size limit ...]"
        return {
            "success": True,
            "path": path,
            "content": content,
            "size_bytes": len(content.encode("utf-8")),
            "lines": len(content.splitlines()),
        }
    except Exception as e:
        return {"error": f"Failed to read file: {e}"}


def list_dir(path: str, root: str) -> dict:
    """Non-recursive directory listing (list_dir.py:12-58 envelope:
    entries with name/type/size, total_count)."""
    try:
        p = _secure(root, path)
        if p is None:
            return {"error": f"Path escapes the sandbox: {path}"}
        if not os.path.exists(p):
            return {"error": f"Path not found: {path}"}
        if not os.path.isdir(p):
            return {"error": f"Path is not a directory: {path}"}
        entries = []
        for item in sorted(os.listdir(p)):
            full = os.path.join(p, item)
            is_dir = os.path.isdir(full)
            try:  # dangling symlink / racing delete: degrade per-entry
                size = None if is_dir else os.path.getsize(full)
            except OSError:
                size = None
            entries.append(
                {
                    "name": item,
                    "type": "directory" if is_dir else "file",
                    "size_bytes": size,
                }
            )
        return {
            "success": True,
            "path": path,
            "entries": entries,
            "total_count": len(entries),
        }
    except Exception as e:
        return {"error": f"Failed to list directory: {e}"}


def write_to_file(path: str, content: str, root: str, append: bool = False) -> dict:
    """Create/overwrite or append (write_to_file.py:12-61 envelope)."""
    try:
        p = _secure(root, path)
        if p is None:
            return {"error": f"Path escapes the sandbox: {path}"}
        os.makedirs(os.path.dirname(p) or p, exist_ok=True)
        with open(p, "a" if append else "w", encoding="utf-8") as f:
            f.write(content)
        return {
            "success": True,
            "path": path,
            "mode": "appended" if append else "written",
            "bytes_written": len(content.encode("utf-8")),
        }
    except Exception as e:
        return {"error": f"Failed to write to file: {e}"}


def replace_file_content(path: str, target: str, replacement: str, root: str) -> dict:
    """Replace ALL occurrences of a literal string
    (replace_file_content.py:12-64 envelope; contrast with
    data_tools.edit_data, which requires a UNIQUE match)."""
    try:
        p = _secure(root, path)
        if p is None:
            return {"error": f"Path escapes the sandbox: {path}"}
        if not os.path.exists(p):
            return {"error": f"File not found at {path}"}
        # newline="" preserves CRLF byte-for-byte: a one-string edit
        # must not silently rewrite every line ending in the file
        with open(p, encoding="utf-8", newline="") as f:
            content = f.read()
        if target not in content:
            return {"error": f"Target string not found in {path}"}
        occurrences = content.count(target)
        with open(p, "w", encoding="utf-8", newline="") as f:
            f.write(content.replace(target, replacement))
        return {
            "success": True,
            "path": path,
            "occurrences_replaced": occurrences,
            "target_length": len(target),
            "replacement_length": len(replacement),
        }
    except Exception as e:
        return {"error": f"Failed to replace content: {e}"}


_HUNK_RE = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


def apply_patch(path: str, patch_text: str, root: str) -> dict:
    """Apply a unified diff (``difflib.unified_diff`` format) with
    strict context verification. All-or-nothing: any context mismatch
    rejects the whole patch and the file is untouched
    (apply_patch/apply_diff envelope: patches_applied / error)."""
    try:
        p = _secure(root, path)
        if p is None:
            return {"error": f"Path escapes the sandbox: {path}"}
        if not os.path.exists(p):
            return {"error": f"File not found at {path}"}
        # newline="" so CRLF content is matched literally: a CRLF file
        # is REJECTED on context mismatch (patch context carries no
        # \r) rather than silently normalized to LF on every line
        with open(p, encoding="utf-8", newline="") as f:
            lines = f.read().splitlines(keepends=True)

        plines = patch_text.splitlines()
        out: list[str] = []
        pos = 0  # 0-based cursor into `lines`
        hunks = 0
        i = 0
        while i < len(plines):
            m = _HUNK_RE.match(plines[i])
            if not m:
                i += 1  # headers (---/+++) and noise between hunks
                continue
            hunks += 1
            old_start = int(m.group(1)) - 1
            old_len = int(m.group(2) or "1")
            if old_len == 0:
                old_start += 1  # pure-insert hunk: @@ -N,0 means AFTER line N
            if old_start < pos:
                return {"error": f"Hunk {hunks} overlaps a previous hunk"}
            out.extend(lines[pos:old_start])
            pos = old_start
            i += 1
            consumed = 0
            prev_tag = None
            while i < len(plines) and not _HUNK_RE.match(plines[i]):
                tag, text = plines[i][:1], plines[i][1:]
                if tag not in (" ", "-", "+", "\\"):
                    break  # next file header / end of patch body
                if tag in (" ", "-"):
                    if pos >= len(lines) or lines[pos].rstrip("\n") != text:
                        return {
                            "error": f"Hunk {hunks} context mismatch at line {pos + 1}"
                        }
                    if tag == " ":
                        out.append(lines[pos])
                    pos += 1
                    consumed += 1
                elif tag == "+":
                    out.append(text + "\n")
                else:  # "\ No newline at end of file"
                    # the marker describes the PRECEDING diff line; it
                    # only affects the OUTPUT when that line is kept
                    # ('+' or ' ') — after a '-' it refers to the OLD
                    # file's removed line and must not strip anything
                    if prev_tag in ("+", " ") and out and out[-1].endswith("\n"):
                        out[-1] = out[-1][:-1]
                prev_tag = tag
                i += 1
            if consumed != old_len:
                return {"error": f"Hunk {hunks} is truncated"}
        if hunks == 0:
            return {"error": "No hunks found in patch text"}
        out.extend(lines[pos:])
        with open(p, "w", encoding="utf-8", newline="") as f:
            f.write("".join(out))
        return {
            "success": True,
            "path": path,
            "patches_applied": hunks,
            "all_successful": True,
        }
    except Exception as e:
        return {"error": f"Failed to apply patch: {e}"}
