"""Minimal stdlib xlsx writer (no openpyxl in this environment).

Writes inline-string / numeric / boolean cells — enough to exercise the
parser and converter against FIXTURES.md group A schemas and to build
bench fixtures. A test/bench utility, not part of the converter parity
surface (the reference only reads xlsx).
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape, quoteattr

from catme_etl_j_spark.converter.formats import BUILTIN_FORMATS, FIRST_CUSTOM_FMT_ID

_BUILTIN_BY_CODE = {code: fid for fid, code in BUILTIN_FORMATS.items()}


class Styled:
    """Wraps a numeric cell value with an Excel number-format code, e.g.
    ``Styled(44927, "yyyy-mm-dd")``. The writer collects distinct codes
    into styles.xml (builtin ids where possible, custom from 164)."""

    __slots__ = ("value", "code")

    def __init__(self, value, code: str) -> None:
        self.value = value
        self.code = code

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_index_to_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _cell_xml(row: int, col: int, value, xf_of_code: dict[str, int]) -> str:
    ref = f"{_col_index_to_letters(col)}{row + 1}"
    if value is None:
        return ""
    if isinstance(value, Styled):
        xf = xf_of_code[value.code]
        return f'<c r="{ref}" s="{xf}"><v>{value.value!r}</v></c>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def _styles_xml(codes: list[str]) -> tuple[str, dict[str, int]]:
    """styles.xml text + {format_code: cellXfs index}. xf 0 is General."""
    custom: list[tuple[int, str]] = []
    next_id = FIRST_CUSTOM_FMT_ID
    fmt_ids: dict[str, int] = {}
    for code in codes:
        if code in _BUILTIN_BY_CODE:
            fmt_ids[code] = _BUILTIN_BY_CODE[code]
        else:
            fmt_ids[code] = next_id
            custom.append((next_id, code))
            next_id += 1
    num_fmts = "".join(
        f"<numFmt numFmtId=\"{fid}\" formatCode={quoteattr(code)}/>" for fid, code in custom
    )
    xfs = ['<xf numFmtId="0"/>']
    xf_of_code: dict[str, int] = {}
    for i, code in enumerate(codes, start=1):
        xfs.append(f'<xf numFmtId="{fmt_ids[code]}" applyNumberFormat="1"/>')
        xf_of_code[code] = i
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + (f'<numFmts count="{len(custom)}">{num_fmts}</numFmts>' if custom else "")
        + f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
        "</styleSheet>"
    )
    return xml, xf_of_code


def _collect_codes(sheets: dict[str, list[list | None]]) -> list[str]:
    codes: list[str] = []
    for rows in sheets.values():
        for row in rows:
            for v in row or ():
                if isinstance(v, Styled) and v.code not in codes:
                    codes.append(v.code)
    return codes


def _sheet_xml(
    rows: list[list | None],
    xf_of_code: dict[str, int],
    skip_rows: set[int] | None = None,
) -> str:
    """rows[i] is a list of cell values (None cell -> omitted from XML);
    rows[i] is None -> row index i entirely absent from the sheet."""
    n_rows = len(rows)
    n_cols = max((len(r) for r in rows if r), default=1)
    dim_end = f"{_col_index_to_letters(max(n_cols - 1, 0))}{max(n_rows, 1)}"
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        f'<dimension ref="A1:{dim_end}"/>',
        "<sheetData>",
    ]
    for i, row in enumerate(rows):
        if row is None:
            continue
        cells = "".join(_cell_xml(i, j, v, xf_of_code) for j, v in enumerate(row))
        parts.append(f'<row r="{i + 1}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    path: str, sheets: dict[str, list[list | None]], *, date1904: bool = False
) -> str:
    """Write {sheet_name: rows} to an xlsx file. Returns the path.

    Cell values wrapped in ``Styled(value, code)`` get a number-format
    style; a ``styles.xml`` part is emitted when any are present.
    ``date1904=True`` marks the workbook as 1904-date-system."""
    sheet_names = list(sheets)
    codes = _collect_codes(sheets)
    styles_xml, xf_of_code = _styles_xml(codes) if codes else ("", {})
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        f'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheet_names))
    )
    if codes:
        overrides += (
            '\n<Override PartName="/xl/styles.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        )
    wb_sheets = "".join(
        f"<sheet name={quoteattr(name)} sheetId=\"{i + 1}\" r:id=\"rId{i + 1}\"/>"
        for i, name in enumerate(sheet_names)
    )
    wb_pr = '<workbookPr date1904="1"/>' if date1904 else ""
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"{wb_pr}<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_names))
        )
        + (
            f'<Relationship Id="rId{len(sheet_names) + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
            'Target="styles.xml"/>'
            if codes
            else ""
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        if codes:
            zf.writestr("xl/styles.xml", styles_xml)
        for i, name in enumerate(sheet_names):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[name], xf_of_code))
    return path
