"""Vendored stdlib-only xlsx codec (zipfile + xml.etree).

The reference reads xlsx natively via calamine
(`src/data_source/excel.rs:11-101`); this container has no openpyxl,
so the default loader decodes the OOXML container directly — an .xlsx
file is a zip holding XML parts:

- ``xl/workbook.xml``          sheet names → relationship ids
- ``xl/_rels/workbook.xml.rels`` relationship ids → worksheet parts
- ``xl/sharedStrings.xml``     the shared-string table
- ``xl/worksheets/sheetN.xml`` rows of typed cells

Supported cell types: ``s`` (shared string), ``str`` (formula string),
``inlineStr``, ``b`` (boolean), and untyped numerics. Dates surface as
their raw serial numbers (calamine does the same unless styled-date
decoding is requested — documented deviation, SURVEY.md §7.4).

A minimal writer lives here too so tests can round-trip real workbooks
without any third-party engine (it emits sharedStrings + numeric cells,
exercising both reader paths).
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

import pandas as pd

from easydb_server_spark.errors import UnsupportedFormatError

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _local(tag: str) -> str:
    """Strip the XML namespace: '{uri}row' -> 'row'."""
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int | None:
    """'B7' -> 1 (0-based column). None when the cell has no ref."""
    m = _CELL_REF_RE.match(ref or "")
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _text_of(el: ET.Element) -> str:
    """Concatenated text of every <t> descendant (rich-text runs)."""
    return "".join(t.text or "" for t in el.iter() if _local(t.tag) == "t")


def _sheet_part(zf: zipfile.ZipFile, sheet: str | int) -> str:
    """Resolve a sheet name/index to its worksheet part path."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels if _local(rel.tag) == "Relationship"
    }
    sheets = []  # (name, target)
    for el in wb.iter():
        if _local(el.tag) == "sheet":
            rid = next((v for k, v in el.attrib.items() if k.endswith("}id") or k == "id"), None)
            sheets.append((el.get("name"), rid_to_target.get(rid)))
    if not sheets:
        raise UnsupportedFormatError("xlsx workbook has no sheets")
    # String selectors match by NAME first (pandas/openpyxl/calamine
    # convention — a sheet literally named '2024' must be addressable);
    # all-digit strings fall back to index interpretation only when no
    # sheet has that name. Plain ints are always indices.
    target = None
    if isinstance(sheet, str):
        target = next((t for n, t in sheets if n == sheet), None)
    if target is None and (isinstance(sheet, int) or (isinstance(sheet, str) and sheet.isdigit())):
        idx = int(sheet)
        if idx >= len(sheets):
            raise UnsupportedFormatError(f"xlsx sheet index {idx} out of range")
        target = sheets[idx][1]
    if target is None:
        raise UnsupportedFormatError(f"xlsx sheet not found: {sheet!r}")
    if target.startswith("/"):
        return target[1:]
    return target if target.startswith("xl/") else f"xl/{target}"


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    return [_text_of(si) for si in ET.fromstring(raw) if _local(si.tag) == "si"]


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return _text_of(cell)
    v = next((ch for ch in cell if _local(ch.tag) == "v"), None)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text in ("1", "true")
    # numeric: int when exact, else float
    try:
        f = float(v.text)
        return int(f) if f.is_integer() and "e" not in v.text.lower() and "." not in v.text else f
    except ValueError:
        return v.text


def load_xlsx_bytes(data: bytes, sheet: str | int = 0) -> pd.DataFrame:
    """Decode one workbook: header = row 0 (reference behavior,
    `src/data_source/excel.rs:36-47`), data rows padded/truncated to
    the header width."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise UnsupportedFormatError("not a valid xlsx (zip) file") from e
    with zf:
        shared = _shared_strings(zf)
        sheet_xml = ET.fromstring(zf.read(_sheet_part(zf, sheet)))
        rows: list[list] = []
        for row_el in sheet_xml.iter():
            if _local(row_el.tag) != "row":
                continue
            vals: list = []
            for cell in row_el:
                if _local(cell.tag) != "c":
                    continue
                idx = _col_index(cell.get("r", ""))
                if idx is None:
                    idx = len(vals)
                while len(vals) <= idx:
                    vals.append(None)
                vals[idx] = _cell_value(cell, shared)
            rows.append(vals)
    if not rows:
        return pd.DataFrame()
    header = ["" if v is None else str(v) for v in rows[0]]
    width = len(header)
    data_rows = [(r + [None] * width)[:width] for r in rows[1:]]
    return pd.DataFrame(data_rows, columns=header)


def load_xlsx(path: str, sheet: str | int = 0) -> pd.DataFrame:
    with open(path, "rb") as f:
        return load_xlsx_bytes(f.read(), sheet)


# ---------- minimal writer (tests / export round-trips) ----------

_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}"
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _col_letters(idx: int) -> str:
    s = ""
    n = idx + 1
    while n:
        n, rem = divmod(n - 1, 26)
        s = chr(65 + rem) + s
    return s


def _xml_escape(s: str) -> str:
    # also escapes quotes: sheet names land inside name="..." attributes
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
    )


def write_xlsx(path: str, sheets: dict[str, tuple[list[str], list[list]]]) -> None:
    """Write {sheet_name: (columns, rows)} as a minimal valid workbook.

    Strings go through the shared-string table, numbers/bools inline —
    so a round-trip exercises every reader branch.
    """
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xmls: list[str] = []
    for _name, (columns, rows) in sheets.items():
        out = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?><worksheet xmlns="{_NS_MAIN}"><sheetData>']
        for rnum, vals in enumerate([columns, *rows], start=1):
            cells = []
            for cidx, v in enumerate(vals):
                ref = f"{_col_letters(cidx)}{rnum}"
                if v is None:
                    continue
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="s"><v>{sref(str(v))}</v></c>')
            out.append(f'<row r="{rnum}">{"".join(cells)}</row>')
        out.append("</sheetData></worksheet>")
        sheet_xmls.append("".join(out))

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{_xml_escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_R}"><sheets>{wb_sheets}</sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS_MAIN}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_xml_escape(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xmlstr in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xmlstr)
