"""Minimal stdlib XLSX engine (zipfile + xml.etree) — no openpyxl.

The reference's Excel components sit on openpyxl
(``src/etl_core/receivers/files/excel/excel_helper.py:110-241``); this
container doesn't ship it, so the pandas bridge in ``excel_io.py`` was
import-gated and the real path never executed. XLSX is just a zip of
ECMA-376 SpreadsheetML parts, so a small stdlib implementation makes
the path executable everywhere:

- ``write_xlsx``: emits a valid single-sheet workbook. Strings go out
  as inline strings (``t="inlineStr"``) so no sharedStrings table is
  needed; ints/floats as numeric cells; bools as ``t="b"``;
  datetime/date as ISO-8601 inline strings (no style table — the
  reference's pandas bridge also surfaces them as text on an
  all-string read); ``None``/NaN cells are simply omitted (sparse).
- ``read_xlsx``: parses any conforming workbook — inline strings,
  sharedStrings (``t="s"``, rich-text runs joined), formula string
  results (``t="str"``), booleans (``t="b"`` → ``"True"``/``"False"``,
  matching ``pd.read_excel(dtype=str)``), and raw numeric text.
  Returns header + all-string rows, mirroring the engine's all-string
  file-read parity (see ``csv_io.py``).

Driver-side by design: Excel has no splittable distributed reader
anywhere (the reference reads on one node too, helper:133-142).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Any, Optional, Sequence

NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
NS_DOC_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_XML_SPACE = "{http://www.w3.org/XML/1998/namespace}space"

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")

# Characters XML 1.0 cannot carry even escaped (everything < 0x20
# except TAB/LF/CR). OOXML's own convention (ECMA-376 §22.9.2.19,
# ST_Xstring) encodes them as _xHHHH_; a literal "_xHHHH_" in user
# text must itself have its underscore escaped as _x005F_.
_XML_ILLEGAL = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")
_XSTRING_SEQ = re.compile(r"_x[0-9A-Fa-f]{4}_")


def _xstring_escape(text: str) -> str:
    # escape pre-existing _xHHHH_ lookalikes FIRST (leading underscore
    # becomes _x005F_), or the real escapes added next would be
    # indistinguishable from user text on read-back
    text = _XSTRING_SEQ.sub(lambda m: "_x005F_" + m.group(0)[1:], text)
    return _XML_ILLEGAL.sub(lambda m: f"_x{ord(m.group(0)):04X}_", text)


def _xstring_unescape(text: str) -> str:
    return _XSTRING_SEQ.sub(
        lambda m: chr(int(m.group(0)[2:-1], 16)), text
    )


def col_letter(idx: int) -> str:
    """0-based column index → spreadsheet letters (0→A, 26→AA)."""
    if idx < 0:
        raise ValueError("column index must be >= 0")
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def col_index(ref: str) -> int:
    """Cell reference → 0-based column index ('BC12' → 54)."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"bad cell reference: {ref!r}")
    acc = 0
    for ch in m.group(1):
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    return acc - 1


# ---------------------------------------------------------------- write

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{NS_PKG_REL}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{NS_PKG_REL}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _workbook_xml(sheet_name: str) -> str:
    wb = ET.Element(f"{{{NS_MAIN}}}workbook")
    sheets = ET.SubElement(wb, f"{{{NS_MAIN}}}sheets")
    ET.SubElement(
        sheets,
        f"{{{NS_MAIN}}}sheet",
        {"name": sheet_name, "sheetId": "1", f"{{{NS_DOC_REL}}}id": "rId1"},
    )
    ET.register_namespace("", NS_MAIN)
    ET.register_namespace("r", NS_DOC_REL)
    return ET.tostring(wb, encoding="unicode", xml_declaration=True)


def _is_missing(value: Any) -> bool:
    if value is None:
        return True
    if isinstance(value, float) and value != value:  # NaN
        return True
    return False


def _append_cell(row_el: ET.Element, ref: str, value: Any) -> None:
    cell = ET.SubElement(row_el, f"{{{NS_MAIN}}}c", {"r": ref})
    if isinstance(value, bool):
        cell.set("t", "b")
        ET.SubElement(cell, f"{{{NS_MAIN}}}v").text = "1" if value else "0"
        return
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value in (float("inf"), float("-inf"))):
            # XLSX numeric cells cannot hold ±inf; surface as text
            value = repr(value)
        else:
            ET.SubElement(cell, f"{{{NS_MAIN}}}v").text = repr(value)
            return
    text = _xstring_escape(value if isinstance(value, str) else _to_text(value))
    cell.set("t", "inlineStr")
    is_el = ET.SubElement(cell, f"{{{NS_MAIN}}}is")
    t_el = ET.SubElement(is_el, f"{{{NS_MAIN}}}t")
    t_el.text = text
    if text != text.strip():
        t_el.set(_XML_SPACE, "preserve")


def _to_text(value: Any) -> str:
    iso = getattr(value, "isoformat", None)
    if iso is not None:  # datetime / date / time
        return iso(sep=" ") if hasattr(value, "hour") and hasattr(value, "date") else iso()
    return str(value)


def write_xlsx(
    path: str,
    header: Sequence[str],
    rows: Sequence[Sequence[Any]],
    sheet_name: str = "Sheet1",
) -> None:
    """Write header + rows as a single-sheet workbook at ``path``."""
    ws = ET.Element(f"{{{NS_MAIN}}}worksheet")
    sheet_data = ET.SubElement(ws, f"{{{NS_MAIN}}}sheetData")
    for r, values in enumerate([list(header)] + [list(r) for r in rows], start=1):
        row_el = ET.SubElement(sheet_data, f"{{{NS_MAIN}}}row", {"r": str(r)})
        for c, value in enumerate(values):
            if _is_missing(value):
                continue  # sparse: omitted cell reads back as None
            _append_cell(row_el, f"{col_letter(c)}{r}", value)
    ET.register_namespace("", NS_MAIN)
    sheet_xml = ET.tostring(ws, encoding="unicode", xml_declaration=True)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)


# ----------------------------------------------------------------- read


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{{{NS_MAIN}}}si"):
        # plain <t> or rich-text runs <r><t>; join every t in order
        out.append("".join(t.text or "" for t in si.iter(f"{{{NS_MAIN}}}t")))
    return out


def _sheet_part(zf: zipfile.ZipFile, sheet_name: Optional[object]) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = [
        (el.get("name"), el.get(f"{{{NS_DOC_REL}}}id"))
        for el in wb.iter(f"{{{NS_MAIN}}}sheet")
    ]
    if not sheets:
        raise ValueError("workbook has no sheets")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{{{NS_PKG_REL}}}Relationship")
    }
    if sheet_name is None or isinstance(sheet_name, int):
        idx = 0 if sheet_name is None else sheet_name
        try:
            name, rid = sheets[idx]
        except IndexError:
            raise ValueError(f"sheet index {idx} out of range ({len(sheets)} sheets)")
    else:
        matches = [s for s in sheets if s[0] == sheet_name]
        if not matches:
            names = [s[0] for s in sheets]
            raise ValueError(f"no sheet named {sheet_name!r}; have {names}")
        name, rid = matches[0]
    target = targets.get(rid)
    if target is None:
        raise ValueError(f"sheet {name!r} has no relationship target")
    # OPC permits ABSOLUTE part targets ('/xl/worksheets/sheet1.xml');
    # normalize before deciding whether the 'xl/' prefix is needed —
    # prefixing the un-normalized form produced 'xl/xl/...' KeyErrors
    target = target.lstrip("/")
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_text(cell: ET.Element, shared: list[str]) -> Optional[str]:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{{{NS_MAIN}}}is")
        if is_el is None:
            return None
        return _xstring_unescape(
            "".join(t.text or "" for t in is_el.iter(f"{{{NS_MAIN}}}t"))
        )
    v = cell.find(f"{{{NS_MAIN}}}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return _xstring_unescape(shared[int(v.text)])
    if ctype == "b":
        return "True" if v.text.strip() == "1" else "False"
    if ctype == "str":
        return _xstring_unescape(v.text)
    return v.text  # "n" numeric (raw text)


def read_xlsx(
    path: str, sheet_name: Optional[object] = None
) -> tuple[list[str], list[list[Optional[str]]]]:
    """Read a worksheet → (header, rows of Optional[str]).

    First row is the header; missing header cells become
    ``Unnamed: {i}`` (pandas convention). Data rows are padded to the
    header width with ``None``; rows wider than the header extend it.
    """
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        part = _sheet_part(zf, sheet_name)
        sheet = ET.fromstring(zf.read(part))

    raw_rows: list[list[Optional[str]]] = []
    for row_el in sheet.iter(f"{{{NS_MAIN}}}row"):
        cells: list[Optional[str]] = []
        for pos, cell in enumerate(row_el.findall(f"{{{NS_MAIN}}}c")):
            ref = cell.get("r")
            idx = col_index(ref) if ref else pos
            while len(cells) <= idx:
                cells.append(None)
            cells[idx] = _cell_text(cell, shared)
        raw_rows.append(cells)

    if not raw_rows:
        return [], []
    width = max(len(r) for r in raw_rows)
    head_cells = raw_rows[0] + [None] * (width - len(raw_rows[0]))
    header = [
        h if h is not None else f"Unnamed: {i}" for i, h in enumerate(head_cells)
    ]
    rows = [r + [None] * (width - len(r)) for r in raw_rows[1:]]
    return header, rows
