"""Minimal pure-python .xlsx reader (zip + XML, first worksheet only).

The reference's Excel ingest reads sheet 1 of simple workbooks row by
row (reference: code/DIZService.Core/CommandExecuter.cs:1915-2027 —
header row then data rows, no formulas/styles semantics). An .xlsx file
is a zip archive of XML parts; for that surface the stdlib is enough:

- ``xl/workbook.xml``       — sheet list; first sheet's relationship id
- ``xl/_rels/workbook.xml.rels`` — r:id → worksheet part path
- ``xl/sharedStrings.xml``  — the shared-string table (cells with
  ``t="s"`` store an index into it)
- ``xl/worksheets/sheetN.xml`` — rows of ``<c r="B2" t="s"><v>…</v></c>``

This exists so the ingest pipeline exercises REAL workbooks even in
environments without openpyxl (``file_ingest.read_sheet`` prefers
pandas/openpyxl when available and falls back here). Scope is the
reference's: values only — no formula evaluation, no style-driven date
typing (a date cell surfaces as its numeric Excel serial), first sheet
only.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26 (cell ref column letters)."""
    m = _CELL_REF.match(ref)
    acc = 0
    for ch in (m.group(1) if m else "A"):
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    return acc - 1


def _first_sheet_part(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet's worksheet part via workbook rels;
    fall back to the conventional path for hand-rolled archives."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheet = wb.find(f"{_MAIN_NS}sheets/{_MAIN_NS}sheet")
        rid = sheet.get(f"{_DOC_REL_NS}id") if sheet is not None else None
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.findall(f"{_REL_NS}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target", "")
                return target if target.startswith("xl/") else f"xl/{target}"
    except (KeyError, ET.ParseError):
        pass
    return "xl/worksheets/sheet1.xml"


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{_MAIN_NS}si"):
        # a shared string is one <t> or a sequence of rich-text runs
        out.append("".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t")))
    return out


def _cell_value(c: "ET.Element", shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter(f"{_MAIN_NS}t"))
    v = c.find(f"{_MAIN_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t in ("str",):  # cached formula result, already text
        return v.text
    if t == "b":
        return v.text.strip() in ("1", "true", "TRUE")
    # numeric: int when integral so ids survive round-trips exactly
    txt = v.text.strip()
    try:
        f = float(txt)
    except ValueError:
        return txt
    return int(f) if f.is_integer() and "e" not in txt.lower() and "." not in txt else f


def read_xlsx_rows(path: str) -> list[list]:
    """First worksheet as a list of rows (lists of python values);
    sparse cells materialize as None, rows are padded to the widest."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_part(zf)))
    rows: list[list] = []
    for row in sheet.iter(f"{_MAIN_NS}row"):
        vals: list = []
        prev_idx = -1
        for c in row.findall(f"{_MAIN_NS}c"):
            ref = c.get("r")
            # c/@r is OPTIONAL in OOXML: r-less cells are positionally
            # sequential after the previous cell — falling back to
            # column 'A' would make every such cell overwrite column 0
            idx = _col_index(ref) if ref else prev_idx + 1
            prev_idx = idx
            while len(vals) <= idx:
                vals.append(None)
            vals[idx] = _cell_value(c, shared)
        rows.append(vals)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx_pandas(path: str):
    """First worksheet as a pandas DataFrame, first row as header —
    the same shape ``pd.read_excel`` gives for the simple sheets the
    reference handles."""
    import pandas as pd

    rows = read_xlsx_rows(path)
    if not rows:
        return pd.DataFrame()
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return pd.DataFrame(rows[1:], columns=header)
