"""Synthesize the reference-headline-scale single-sheet xlsx (VERDICT r8 #5).

The reference's one quantitative claim is "~700 MB tested, multi-GB
designed" with a bounded-memory conversion invariant
(/root/reference/README.md:11, contract :98, :220-225). The repo's
converter benches only a 100k-row sheet, so nothing demonstrated the
invariant at a few-hundred-MB single sheet. This tool streams a
~500 MB-of-sheet-XML workbook (1.2M rows x 8 cols, mixed inline
strings + numbers) WITHOUT ever holding the sheet in memory itself
(zipfile.open(mode="w") streaming member write) — the generator must
not need the memory the converter is proving it doesn't need.

Content is deterministic (counter-derived, no RNG/time) and carries
enough entropy that the compressed entry stays above the converter's
min-inflate-ratio cap (0.01): measured ratio ~0.05.

Usage: python tools/gen_bigxlsx.py [path] [n_rows]
       (default /root/repo/.scaledata/bigsheet.xlsx, 1_200_000 rows;
        ~470 MB sheet XML, ~25 MB file; skipped if already present)
"""

from __future__ import annotations

import os
import sys
import zipfile

N_ROWS_DEFAULT = 1_200_000
N_COLS = 8
_CHUNK_ROWS = 20_000

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet.xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="big" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/></Relationships>'
)

_COLS = "ABCDEFGH"


def _row_xml(i: int) -> str:
    # 4 inline-string + 4 numeric cells; values counter-derived so the
    # deflate ratio stays well above the 0.01 zip-bomb floor
    r = i + 2  # 1-based, after the header row
    cells = []
    for j in range(4):
        v = f"u{(i * 31 + j * 7) % 9973}-{i}-{j}"
        cells.append(
            f'<c r="{_COLS[j]}{r}" t="inlineStr"><is><t>{v}</t></is></c>'
        )
    for j in range(4, N_COLS):
        v = f"{(i * 17 + j) % 100000}.{i % 97:02d}"
        cells.append(f'<c r="{_COLS[j]}{r}"><v>{v}</v></c>')
    return f'<row r="{r}">{"".join(cells)}</row>'


def generate(path: str, n_rows: int = N_ROWS_DEFAULT) -> str:
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    xml_bytes = 0
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        with zf.open("xl/worksheets/sheet1.xml", "w") as f:
            head = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                "<sheetData>"
                '<row r="1">'
                + "".join(
                    f'<c r="{_COLS[j]}1" t="inlineStr"><is><t>col_{j}</t></is></c>'
                    for j in range(N_COLS)
                )
                + "</row>"
            )
            b = head.encode()
            f.write(b)
            xml_bytes += len(b)
            for lo in range(0, n_rows, _CHUNK_ROWS):
                chunk = "".join(
                    _row_xml(i) for i in range(lo, min(lo + _CHUNK_ROWS, n_rows))
                )
                b = chunk.encode()
                f.write(b)
                xml_bytes += len(b)
            b = b"</sheetData></worksheet>"
            f.write(b)
            xml_bytes += len(b)
    os.replace(tmp, path)
    print(
        f"{path}: {n_rows} rows, sheet XML {xml_bytes / 1e6:.0f} MB, "
        f"file {os.path.getsize(path) / 1e6:.0f} MB"
    )
    return path


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/bigsheet.xlsx"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_ROWS_DEFAULT
    generate(dst, n)
