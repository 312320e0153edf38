"""Pure-stdlib xlsx reader/writer (zipfile + xml.etree).

xlsx is a zip of XML parts (ECMA-376 / ISO 29500, public spec) — the
same move as the repo's stdlib PDF parser: no third-party Excel
dependency, so the reference's headline excel surface
(excel_read/excel_write/excel_sql, reference:
tools/src/aden_tools/tools/excel_tool/excel_tool.py:16-145,148-330,
474-654) works in any environment.

Reader semantics mirror ``_convert_cell_value`` typing
(excel_tool.py:792-801): numbers stay int/float, booleans bool,
strings str, date-formatted serial numbers become ``datetime``
(callers ISO-format them). Supports shared strings (plain + rich-text
runs), inline strings, formula cached values, and date detection via
styles.xml number formats.

Writer emits a minimal valid workbook: strings as inline strings (no
shared-string table needed), numbers/bools natively typed — enough
for round-trip and for external tools to open.

Excel is inherently small-data (the reference caps reads at a few
thousand rows); parsing is driver-side, the resulting sheets become
Spark DataFrames for distributed SQL.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from typing import Any, Iterable
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_EXCEL_EPOCH = _dt.datetime(1899, 12, 30)

# Built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30).
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))

# Custom format codes: date-ish if they contain y/m/d/h/s tokens
# outside quoted literals and color/condition brackets.
_FMT_LITERAL_RE = re.compile(r'"[^"]*"|\[[^\]]*\]')
_FMT_DATE_TOKEN_RE = re.compile(r"[ymdhs]", re.IGNORECASE)


def _is_date_format(code: str) -> bool:
    return bool(_FMT_DATE_TOKEN_RE.search(_FMT_LITERAL_RE.sub("", code)))


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB3' -> 27."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _text_of(si: ET.Element) -> str:
    """Concatenated text of an <si>/<is> (plain <t> or rich-text runs)."""
    return "".join(t.text or "" for t in si.iter() if t.tag.endswith("}t"))


def _serial_to_datetime(serial: float) -> _dt.datetime:
    return _EXCEL_EPOCH + _dt.timedelta(days=serial)


def read_workbook(path: str) -> dict[str, list[list[Any]]]:
    """Workbook -> {sheet_name: rows} with typed cells.

    Rows are dense lists padded with None to the widest row; sheet
    order follows the workbook part (what Excel shows as tab order).
    """
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())

        # shared strings (optional part)
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in root if si.tag.endswith("}si")]

        # style index -> is-date?
        date_styles: set[int] = set()
        if "xl/styles.xml" in names:
            sroot = ET.fromstring(zf.read("xl/styles.xml"))
            custom_date_ids = {
                int(nf.get("numFmtId", "-1"))
                for nfs in sroot.iter()
                if nfs.tag.endswith("}numFmts")
                for nf in nfs
                if _is_date_format(nf.get("formatCode", ""))
            }
            xfs = [
                xf
                for block in sroot.iter()
                if block.tag.endswith("}cellXfs")
                for xf in block
                if xf.tag.endswith("}xf")
            ]
            for i, xf in enumerate(xfs):
                fmt = int(xf.get("numFmtId", "0"))
                if fmt in _BUILTIN_DATE_FMTS or fmt in custom_date_ids:
                    date_styles.add(i)

        # workbook sheet list: name -> rId -> worksheet part
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            rel.get("Id"): rel.get("Target") for rel in rels if rel.get("Target")
        }
        R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        sheets: dict[str, list[list[Any]]] = {}
        for sheet in wb.iter():
            if not sheet.tag.endswith("}sheet"):
                continue
            name = sheet.get("name", "Sheet")
            target = rid_to_target.get(sheet.get(R), "")
            part = "xl/" + target.lstrip("/").removeprefix("xl/")
            if part not in zf.namelist():
                continue
            sheets[name] = _read_sheet_part(zf.read(part), shared, date_styles)
        return sheets


def _read_sheet_part(
    data: bytes, shared: list[str], date_styles: set[int]
) -> list[list[Any]]:
    root = ET.fromstring(data)
    rows: list[list[Any]] = []
    width = 0
    for row in root.iter():
        if not row.tag.endswith("}row"):
            continue
        cells: list[Any] = []
        next_idx = 0
        for c in row:
            if not c.tag.endswith("}c"):
                continue
            ref = c.get("r")
            idx = _col_index(ref) if ref else next_idx
            while len(cells) < idx:
                cells.append(None)
            cells.append(_cell_value(c, shared, date_styles))
            next_idx = idx + 1
        rows.append(cells)
        width = max(width, len(cells))
    for r in rows:
        r.extend([None] * (width - len(r)))
    return rows


def _cell_value(c: ET.Element, shared: list[str], date_styles: set[int]) -> Any:
    t = c.get("t", "n")
    v_el = next((ch for ch in c if ch.tag.endswith("}v")), None)
    if t == "inlineStr":
        is_el = next((ch for ch in c if ch.tag.endswith("}is")), None)
        return _text_of(is_el) if is_el is not None else None
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if t == "s":
        return shared[int(raw)]
    if t in ("str", "e"):
        return raw
    if t == "b":
        return raw == "1"
    # numeric — maybe a date-styled serial
    num = float(raw)
    style = int(c.get("s", "-1"))
    if style in date_styles:
        return _serial_to_datetime(num)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------
_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{overrides}</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    if isinstance(v, (_dt.datetime, _dt.date)):
        v = v.isoformat()
    s = escape(str(v))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{s}</t></is></c>'


def write_workbook(path: str, sheets: dict[str, Iterable[Iterable[Any]]]) -> None:
    """Write {sheet_name: rows-of-cells} as a minimal xlsx.

    Strings (and datetimes, ISO-formatted — the reference JSON-
    serializes them the same way) are inline strings; ints/floats/
    bools native. Round-trips through ``read_workbook``.
    """
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides, wb_sheets, wb_rels = [], [], []
        for i, (name, rows) in enumerate(sheets.items(), start=1):
            part = f"xl/worksheets/sheet{i}.xml"
            overrides.append(
                f'<Override PartName="/{part}" ContentType="application/'
                'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>\n'
            )
            wb_sheets.append(
                f'<sheet name="{escape(str(name))}" sheetId="{i}" r:id="rId{i}"/>'
            )
            wb_rels.append(
                f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
                f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
            )
            body = []
            for ri, row in enumerate(rows, start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
                )
                body.append(f'<row r="{ri}">{cells}</row>')
            zf.writestr(
                part,
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(body)}</sheetData></worksheet>",
            )
        zf.writestr("[Content_Types].xml", _CT.format(overrides="".join(overrides)))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{''.join(wb_sheets)}</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{''.join(wb_rels)}</Relationships>",
        )
