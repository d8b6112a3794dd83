"""Dependency-free minimal XLSX read/write (stdlib zipfile + ElementTree).

Closes the S7/S8 gap natively: the reference reads a relation-weights
workbook (embedder.py:589-616) and writes XLSX reports
(rel_types.py:120-260) via openpyxl, which this container lacks. XLSX is
the public SpreadsheetML format — a zip of five XML parts — so a single
data sheet needs no third-party library:

* :func:`write_xlsx` — one worksheet, header row + data rows; strings as
  inline strings (``t="inlineStr"``), numbers as plain ``<v>``, None as
  blank. Output opens in Excel/LibreOffice/openpyxl/pandas.
* :func:`read_xlsx` — parses sheet1 of any standard workbook: inline
  strings, shared strings (``t="s"`` + xl/sharedStrings.xml), booleans,
  and numeric cells; returns (header, rows).

Driver-side by design: these are tiny dimension/report tables (the
Spark side broadcasts them); bulk data stays in parquet.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

__all__ = ["write_xlsx", "read_xlsx"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # inf/nan are not valid SpreadsheetML numbers (Excel flags the
        # workbook as corrupt) — write them as blank cells like None
        if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_xlsx(path: str, header: list[str], rows: list[list]) -> None:
    """Write one worksheet: ``header`` then ``rows`` (str/int/float/bool/
    None cells)."""
    body = []
    for r, row in enumerate([list(header)] + [list(x) for x in rows], start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def _ref_to_col(ref: str) -> int:
    """'BC12' → 0-based column index 54."""
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOCREL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _first_sheet_name(zf: zipfile.ZipFile) -> str:
    """Resolve the workbook's FIRST sheet via workbook.xml sheet order +
    the workbook rels (a workbook whose parts are sheet10.xml/sheet2.xml
    after deletions must not be resolved lexicographically)."""
    names = set(zf.namelist())
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        first = wb.find(f"{_NS}sheets/{_NS}sheet")
        rid = first.get(f"{_DOCREL_NS}id") if first is not None else None
        if rid:
            rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rels.findall(f"{_REL_NS}Relationship"):
                if rel.get("Id") == rid:
                    target = rel.get("Target").lstrip("/")
                    cand = target if target.startswith("xl/") else f"xl/{target}"
                    if cand in names:
                        return cand
    except (KeyError, ET.ParseError):
        pass
    if "xl/worksheets/sheet1.xml" in names:
        return "xl/worksheets/sheet1.xml"
    sheets = sorted(n for n in names if n.startswith("xl/worksheets/") and n.endswith(".xml"))
    if not sheets:
        raise ValueError("no worksheet found in workbook")
    return sheets[0]


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """First worksheet → (header, data rows). Handles inline strings,
    shared strings, booleans, and numeric cells (int when integral)."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet = ET.fromstring(zf.read(_first_sheet_name(zf)))
        raw_rows: list[dict[int, object]] = []
        n_cols = 0
        for row in sheet.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            for pos, c in enumerate(row.findall(f"{_NS}c")):
                idx = _ref_to_col(c.get("r")) if c.get("r") else pos
                t = c.get("t", "n")
                if t == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
                else:
                    v = c.find(f"{_NS}v")
                    if v is None or v.text is None:
                        val = None
                    elif t == "s":
                        val = shared[int(v.text)]
                    elif t == "b":
                        val = v.text == "1"
                    elif t == "str":
                        val = v.text
                    elif t == "e":
                        # formula error cell (#DIV/0! etc.) — treat as
                        # missing rather than crashing on float()
                        val = None
                    else:
                        f = float(v.text)
                        val = int(f) if f.is_integer() and "e" not in v.text.lower() and "." not in v.text else f
                cells[idx] = val
                n_cols = max(n_cols, idx + 1)
            raw_rows.append(cells)
    dense = [[r.get(i) for i in range(n_cols)] for r in raw_rows]
    if not dense:
        return [], []
    header = ["" if v is None else str(v) for v in dense[0]]
    return header, dense[1:]
