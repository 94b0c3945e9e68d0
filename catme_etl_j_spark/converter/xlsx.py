"""Pure-stdlib streaming XLSX parser (zipfile + xml.etree.iterparse).

This is the Spark-side rebuild of the reference's SAX ingest (SURVEY.md
§2.1 S1/S2): the reference streams one sheet's XML through POI/EasyExcel
SAX handlers with bounded memory
(src/.../strategy/UserModeEventConversionStrategy.java:282-299,
src/.../strategy/StreamingConversionStrategy.java:77-95). Here the same
single-pass, constant-memory discipline is implemented with
``xml.etree.ElementTree.iterparse`` (elements cleared as consumed);
the two reference strategies collapse into one implementation since
iterparse is already constant-memory (SURVEY.md §2.1 S3 disposition).

Row model matches the reference: ``dict[int, str]`` — 0-based column
index -> formatted cell string (src/.../core/ExcelRowListener.java:30).
Blank cells present in the XML are stored as ``""`` (the live POI
path's convention, UserModeEventConversionStrategy.java:272); cells
absent from the XML are absent from the dict.

Zip-bomb guards mirror §2.6: global min-inflate-ratio (reference
default 0.01, src/.../config/ConverterConfig.java:76-77) and a
max-entry-size cap (reference 6 GB,
UserModeEventConversionStrategy.java:78).

Value formatting: the reference delegates number/date rendering to
POI's DataFormatter (UserModeEventConversionStrategy.java:269-274).
Full Excel format-code support is deliberately out of scope; numbers
render as Excel "General" (integral -> no decimal point), booleans as
TRUE/FALSE. Documented divergence: date-formatted serials render as
their raw serial number.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree.ElementTree import iterparse

from catme_etl_j_spark.converter.errors import (
    ConversionError,
    SheetNotFoundError,
    ZipBombDetectedError,
)

_NS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKGREL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

DEFAULT_MIN_INFLATE_RATIO = 0.01
DEFAULT_MAX_ENTRY_SIZE = 6 * 1024**3  # 6 GB, matches the reference cap

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")

_ROW_TAG = f"{_NS_MAIN}row"
_C_TAG = f"{_NS_MAIN}c"
_V_TAG = f"{_NS_MAIN}v"
_IS_TAG = f"{_NS_MAIN}is"
_T_TAG = f"{_NS_MAIN}t"
_DIM_TAG = f"{_NS_MAIN}dimension"
_SHEETDATA_TAG = f"{_NS_MAIN}sheetData"


def _col_letters_to_index(letters: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _format_number(raw: str) -> str:
    """Excel 'General'-style rendering of a numeric cell value."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f == int(f) and abs(f) < 1e16:
        return str(int(f))
    return repr(f)


class XlsxWorkbook:
    """Random-access wrapper over an xlsx archive with safety caps.

    Accepts a filesystem path or raw bytes (the Spark reader hands the
    ``binaryFile`` content column straight in — no local temp file).
    """

    def __init__(
        self,
        source: str | bytes,
        *,
        min_inflate_ratio: float = DEFAULT_MIN_INFLATE_RATIO,
        max_entry_size: int = DEFAULT_MAX_ENTRY_SIZE,
    ) -> None:
        self._name = source if isinstance(source, str) else "<bytes>"
        try:
            self._zf = zipfile.ZipFile(
                source if isinstance(source, str) else io.BytesIO(source)
            )
        except zipfile.BadZipFile as e:
            raise ConversionError(f"not a valid xlsx (zip) file: {self._name}: {e}") from e
        self._check_zip_bomb(min_inflate_ratio, max_entry_size)
        self._sheets = self._read_sheet_map()

    def _check_zip_bomb(self, min_ratio: float, max_entry: int) -> None:
        for info in self._zf.infolist():
            if info.file_size > max_entry:
                raise ZipBombDetectedError(
                    f"{self._name}:{info.filename} expands to {info.file_size} bytes "
                    f"(cap {max_entry})"
                )
            if (
                info.compress_size > 0
                and info.file_size > 0
                and info.compress_size / info.file_size < min_ratio
            ):
                raise ZipBombDetectedError(
                    f"{self._name}:{info.filename} inflate ratio "
                    f"{info.compress_size / info.file_size:.5f} below minimum {min_ratio}"
                )

    def _read_sheet_map(self) -> list[tuple[str, str]]:
        """[(sheet_name, archive_path)] in workbook order."""
        rels: dict[str, str] = {}
        try:
            with self._zf.open("xl/_rels/workbook.xml.rels") as f:
                for _, el in iterparse(f, events=("end",)):
                    if el.tag == f"{_NS_PKGREL}Relationship":
                        target = el.get("Target", "")
                        if target.startswith("/"):
                            target = target[1:]
                        elif not target.startswith("xl/"):
                            target = "xl/" + target
                        rels[el.get("Id", "")] = target
                    el.clear()
        except KeyError as e:
            raise ConversionError(f"missing workbook relationships: {self._name}") from e
        sheets: list[tuple[str, str]] = []
        try:
            with self._zf.open("xl/workbook.xml") as f:
                for _, el in iterparse(f, events=("end",)):
                    if el.tag == f"{_NS_MAIN}sheet":
                        rid = el.get(f"{_NS_REL}id", "")
                        name = el.get("name", "")
                        if rid in rels:
                            sheets.append((name, rels[rid]))
                    el.clear()
        except KeyError as e:
            raise ConversionError(f"missing workbook.xml: {self._name}") from e
        if not sheets:
            raise ConversionError(f"workbook has no sheets: {self._name}")
        return sheets

    @property
    def sheet_names(self) -> list[str]:
        return [name for name, _ in self._sheets]

    def _shared_strings(self) -> list[str]:
        """Full shared-strings table, loaded once per workbook — the live
        reference does the same (ReadOnlySharedStringsTable,
        UserModeEventConversionStrategy.java:120-127); the lazy LRU
        variant is dead code there (SURVEY.md §2.1 S5) and an
        O(rescan-per-miss) anti-pattern not worth reproducing."""
        try:
            f = self._zf.open("xl/sharedStrings.xml")
        except KeyError:
            return []
        strings: list[str] = []
        with f:
            parts: list[str] = []
            for event, el in iterparse(f, events=("end",)):
                if el.tag == f"{_NS_MAIN}t":
                    parts.append(el.text or "")
                elif el.tag == f"{_NS_MAIN}si":
                    strings.append("".join(parts))
                    parts = []
                    el.clear()
        return strings

    def resolve_sheet(
        self, sheet_name: str | None = None, sheet_index: int | None = None
    ) -> str:
        """Resolve target sheet to its archive path.

        Precedence: index first, then name, then first sheet — the
        documented EasyExcel-path order (SURVEY.md §2.1 S4 decision:
        index-first; StreamingConversionStrategy.java:83-92). A missing
        name/index raises with the available-sheet list, matching
        UserModeEventConversionStrategy.java:156-161.
        """
        if sheet_index is not None:
            if not 0 <= sheet_index < len(self._sheets):
                raise SheetNotFoundError(
                    f"sheet index {sheet_index} out of range; workbook has "
                    f"{len(self._sheets)} sheets: {self.sheet_names}"
                )
            return self._sheets[sheet_index][1]
        if sheet_name is not None:
            for name, path in self._sheets:
                if name == sheet_name:
                    return path
            raise SheetNotFoundError(
                f"sheet {sheet_name!r} not found; available sheets: {self.sheet_names}"
            )
        return self._sheets[0][1]

    def iter_rows(
        self,
        sheet_name: str | None = None,
        sheet_index: int | None = None,
        *,
        continue_on_error: bool = False,
    ) -> Iterator[tuple[int, dict[int, str]]]:
        """Yield (0-based row index, {0-based col index: string value}).

        Single pass, constant memory: each ``row`` element is cleared
        after emission. Sheet row order is preserved (the reference's
        contract-level guarantee, SURVEY.md §1.1). Rows that are
        present-but-empty in the XML yield ``{}`` — matching the live
        inline handler, which does NOT skip empties (SURVEY.md §2.2 R3).

        ``continue_on_error`` is the reference's per-row error policy
        (ExcelRowListener.java:245-271): malformed cells are skipped
        (True) or raise ConversionError (False).
        """
        path = self.resolve_sheet(sheet_name, sheet_index)
        shared = self._shared_strings()
        try:
            f = self._zf.open(path)
        except KeyError as e:
            raise ConversionError(f"sheet part {path} missing in archive") from e
        col_cache: dict[str, int] = {}
        with f:
            seq_row = 0
            for event, el in iterparse(f, events=("end",)):
                if el.tag != _ROW_TAG:
                    continue
                declared = el.get("r")
                row_idx = int(declared) - 1 if declared else seq_row
                seq_row = row_idx + 1
                cells: dict[int, str] = {}
                seq_col = 0
                for c in el:  # direct children: cells
                    if c.tag != _C_TAG:
                        continue
                    ref = c.get("r")
                    if ref:
                        letters = ref.rstrip("0123456789")
                        col = col_cache.get(letters)
                        if col is None:
                            col = _col_letters_to_index(letters)
                            col_cache[letters] = col
                    else:
                        col = seq_col
                    seq_col = col + 1
                    try:
                        cells[col] = self._cell_value(c, shared)
                    except Exception as e:
                        if not continue_on_error:
                            raise ConversionError(
                                f"row {row_idx} col {col}: bad cell: {e}"
                            ) from e
                yield row_idx, cells
                el.clear()

    def _cell_value(self, c, shared: list[str]) -> str:
        ctype = c.get("t", "n")
        if ctype == "inlineStr":
            for child in c:
                if child.tag == _IS_TAG:
                    return "".join(t.text or "" for t in child.iter(_T_TAG))
            return ""
        raw = None
        for child in c:
            if child.tag == _V_TAG:
                raw = child.text
                break
        if raw is None:
            return ""
        if ctype == "s":
            return shared[int(raw)]
        if ctype == "b":
            return "TRUE" if raw.strip() == "1" else "FALSE"
        if ctype in ("str", "e"):
            return raw
        return _format_number(raw)

    def sheet_dimension(
        self, sheet_name: str | None = None, sheet_index: int | None = None
    ) -> tuple[int, int] | None:
        """(n_rows, n_cols) from the sheet's ``dimension`` element, or
        None if absent/unparseable. O(1): stops at the first sheetData
        element. Lets readers size schemas without a full scan."""
        path = self.resolve_sheet(sheet_name, sheet_index)
        try:
            f = self._zf.open(path)
        except KeyError:
            return None
        with f:
            for event, el in iterparse(f, events=("start",)):
                if el.tag == _DIM_TAG:
                    ref = el.get("ref", "")
                    if ":" in ref:
                        m = _CELL_REF_RE.match(ref.split(":")[1])
                        if m:
                            return int(m.group(2)), _col_letters_to_index(m.group(1)) + 1
                    return None
                if el.tag == _SHEETDATA_TAG:
                    return None
        return None

    def close(self) -> None:
        self._zf.close()

    def __enter__(self) -> XlsxWorkbook:
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def list_sheets(source: str | bytes) -> list[str]:
    with XlsxWorkbook(source) as wb:
        return wb.sheet_names
