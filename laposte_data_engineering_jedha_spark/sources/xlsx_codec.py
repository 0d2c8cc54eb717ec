"""Minimal pure-stdlib XLSX codec for the 6-column deliveries contract
(reference sources/readers.py:52-55 / writers.py:61-70).

openpyxl/xlsxwriter are absent in this environment, and an XLSX file is
just a zip of OOXML parts — so the writer emits the five mandatory parts
(content types, package rels, workbook, workbook rels, one worksheet) and
streams rows into the worksheet entry through `zipfile.open(mode="w")`,
preserving the reference's constant-memory property (xlsxwriter
`constant_memory` mode). The reader iterparses the worksheet XML and
resolves shared strings, so it also reads workbooks produced by openpyxl /
xlsxwriter / Excel for the supported cell types.

Cell mapping:
- int/float      -> numeric cell (`<v>`), repr round-trips doubles exactly
- bool           -> boolean cell (t="b")
- str            -> inline string (t="inlineStr"; no sharedStrings table —
                    one pass, constant memory)
- datetime/date  -> ISO-8601 inline string; the pipeline's timestamp-cast
                    contract (readers.cast_timestamp_contract, reference
                    core/extract.py:77-80) re-parses on read, exactly like
                    the CSV round-trip
- None           -> cell omitted

On read, numeric text without '.'/'e' parses to int, otherwise float;
t="s" cells resolve through sharedStrings.xml; t="b" to bool.
"""

from __future__ import annotations

import datetime
import re
import zipfile
from collections.abc import Iterable, Iterator
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_INT_RE = re.compile(r"-?\d+")

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_PACKAGE_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if isinstance(value, datetime.datetime):
        text = value.isoformat(sep=" ")
    elif isinstance(value, datetime.date):
        text = value.isoformat()
    else:
        text = str(value)
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(text)}</t></is></c>'


def write_xlsx(
    path: str,
    columns: list[str],
    rows: Iterable[Iterable],
    sheet_name: str = "deliveries",
) -> None:
    """Stream (header + rows) into a new .xlsx at `path`. `rows` may be any
    iterable (e.g. DataFrame.toLocalIterator()) — worksheet XML is written
    through the zip stream row by row, never materialized."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _PACKAGE_RELS)
        zf.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        with zf.open("xl/worksheets/sheet1.xml", "w") as ws:
            ws.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="' + _MAIN_NS.encode() + b'"><sheetData>'
            )
            for r, row in enumerate([columns], start=1):
                ws.write(_row_xml(r, row).encode("utf-8"))
            for r, row in enumerate(rows, start=2):
                ws.write(_row_xml(r, row).encode("utf-8"))
            ws.write(b"</sheetData></worksheet>")


def _row_xml(r: int, row: Iterable) -> str:
    cells = "".join(
        _cell_xml(f"{_col_letter(i)}{r}", v) for i, v in enumerate(row)
    )
    return f'<row r="{r}">{cells}</row>'


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{{{_MAIN_NS}}}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_MAIN_NS}}}t")))
    return out


def _parse_number(text: str):
    return int(text) if _INT_RE.fullmatch(text) else float(text)


def _cell_value(cell: ET.Element, shared: list[str]):
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{{{_MAIN_NS}}}t"))
    v = cell.find(f"{{{_MAIN_NS}}}v")
    if v is None or v.text is None:
        return None
    if kind == "s":
        return shared[int(v.text)]
    if kind == "b":
        return v.text == "1"
    if kind == "str":
        return v.text
    return _parse_number(v.text)


def _cell_col(cell: ET.Element, default: int) -> int:
    ref = cell.get("r")
    if not ref:
        return default
    letters = "".join(ch for ch in ref if ch.isalpha())
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def read_xlsx(path: str, sheet: str = "xl/worksheets/sheet1.xml") -> tuple[list[str], Iterator[list]]:
    """Read (columns, row-iterator) from the first worksheet. The iterator
    yields lists aligned to the header width (missing cells -> None)."""
    zf = zipfile.ZipFile(path)
    shared = _shared_strings(zf)

    def rows() -> Iterator[list]:
        with zf.open(sheet) as fh:
            for _, el in ET.iterparse(fh):
                if el.tag == f"{{{_MAIN_NS}}}row":
                    out: list = []
                    for cell in el.findall(f"{{{_MAIN_NS}}}c"):
                        col = _cell_col(cell, default=len(out))
                        while len(out) <= col:
                            out.append(None)
                        out[col] = _cell_value(cell, shared)
                    el.clear()
                    yield out

    it = rows()
    try:
        header = [str(c) for c in next(it)]
    except StopIteration:
        zf.close()
        return [], iter(())

    def padded() -> Iterator[list]:
        try:
            for row in it:
                row += [None] * (len(header) - len(row))
                yield row[: len(header)]
        finally:
            zf.close()

    return header, padded()
