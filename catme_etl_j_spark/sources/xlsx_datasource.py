"""Spark 4 Python Data Source for XLSX: ``spark.read.format("xlsx")``.

SURVEY.md §2.1 option (a): the same stdlib streaming parser
(converter/xlsx.py), surfaced through the DataSource V2 Python API so
xlsx behaves like any first-class format — planned partitions (one per
file; a sheet's XML is unsplittable, SURVEY.md §7.7.1), driver-side
schema inference, Arrow-batch row production.

    from catme_etl_j_spark.sources.xlsx_datasource import register
    register(spark)
    df = (spark.read.format("xlsx")
          .option("sheet_name", "Data2024")  # or sheet_index / header_row
          .load("/data/*.xlsx"))

The ``converter.reader.read_xlsx`` (binaryFile + mapInArrow) path is
the PRIMARY reader — ``convert()`` uses it, and measured head-to-head
at 8 files x 12.5k rows (local[32], median of 3 after warm-up) it is
~15% faster (0.83s vs 0.97s) because the DataSource API adds one extra
Arrow serialization hop through the Python worker. This DataSource is
kept as the ergonomic `spark.read.format("xlsx")` surface; both share
the parser and produce identical frames (tests/test_xlsx_datasource.py).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from catme_etl_j_spark.converter.errors import ConversionError
from catme_etl_j_spark.converter.reader import infer_columns
from catme_etl_j_spark.converter.xlsx import (
    DEFAULT_MAX_ENTRY_SIZE,
    DEFAULT_MIN_INFLATE_RATIO,
    XlsxWorkbook,
)


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.xlsx")))
    return sorted(_glob.glob(path))


class XlsxDataSource(DataSource):
    """format("xlsx") — options: sheet_name, sheet_index, header_row,
    continue_on_error, min_inflate_ratio, max_entry_size.

    ``sheet_name`` accepts ``"*"`` (every sheet of every workbook) or a
    comma-separated list — multi-sheet reads plan ONE PARTITION PER
    (file, sheet) and add ``_sheet_idx``/``_sheet`` meta columns.
    (Comma-bearing sheet names need the single-name form.)
    """

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def _opts(self):
        o = self.options
        raw_sheet = o.get("sheet_name")
        if raw_sheet and raw_sheet != "*" and "," in raw_sheet:
            sheet_name: str | list[str] | None = [s.strip() for s in raw_sheet.split(",")]
        else:
            sheet_name = raw_sheet
        return dict(
            sheet_name=sheet_name,
            sheet_index=int(o["sheet_index"]) if o.get("sheet_index") is not None else None,
            header_row=int(o.get("header_row", 0)),
            continue_on_error=str(o.get("continue_on_error", "false")).lower() == "true",
            min_inflate_ratio=float(o.get("min_inflate_ratio", DEFAULT_MIN_INFLATE_RATIO)),
            max_entry_size=int(o.get("max_entry_size", DEFAULT_MAX_ENTRY_SIZE)),
        )

    def _paths(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            raise ConversionError("xlsx source requires a path: .load('/data/*.xlsx')")
        paths = _expand(path)
        if not paths:
            raise ConversionError(f"no files matched {path!r}")
        return paths

    def _is_multi(self) -> bool:
        s = self._opts()["sheet_name"]
        return s == "*" or isinstance(s, list)

    def schema(self):
        opts = self._opts()
        first = self._paths()[0]
        s = opts["sheet_name"]
        infer_sheet = None if s == "*" else (s[0] if isinstance(s, list) else s)
        columns = infer_columns(
            first,
            sheet_name=infer_sheet,
            sheet_index=opts["sheet_index"],
            header_row=opts["header_row"],
            min_inflate_ratio=opts["min_inflate_ratio"],
            max_entry_size=opts["max_entry_size"],
        )
        meta = [T.StructField("_file", T.StringType(), False)]
        if self._is_multi():
            meta += [
                T.StructField("_sheet_idx", T.LongType(), False),
                T.StructField("_sheet", T.StringType(), False),
            ]
        meta.append(T.StructField("_row_idx", T.LongType(), False))
        return T.StructType(meta + [T.StructField(c, T.StringType(), True) for c in columns])

    def reader(self, schema) -> DataSourceReader:
        return _XlsxReader(self._paths(), schema, self._opts(), self._is_multi())


class _XlsxPartition(InputPartition):
    def __init__(self, path: str, sheet: str | None = None, sheet_idx: int | None = None) -> None:
        self.path = path
        self.sheet = sheet
        self.sheet_idx = sheet_idx


class _XlsxReader(DataSourceReader):
    def __init__(self, paths: list[str], schema, opts: dict, multi: bool) -> None:
        self._paths = paths
        self._multi = multi
        self._n_cols = len(schema.fieldNames()) - (4 if multi else 2)
        self._opts = opts

    def partitions(self):
        # one task per file — or per (file, sheet) for multi-sheet reads:
        # a sheet's XML stream is unsplittable, so (file, sheet) is the
        # finest planning grain; listing sheets reads only each zip's
        # central directory + workbook.xml (no sheet data).
        if not self._multi:
            return [_XlsxPartition(p) for p in self._paths]
        o = self._opts
        want = o["sheet_name"]
        parts = []
        for p in self._paths:
            with XlsxWorkbook(
                p,
                min_inflate_ratio=o["min_inflate_ratio"],
                max_entry_size=o["max_entry_size"],
            ) as wb:
                names = wb.sheet_names if want == "*" else list(want)
            parts.extend(_XlsxPartition(p, nm, i) for i, nm in enumerate(names))
        return parts

    def read(self, partition: _XlsxPartition):
        o = self._opts
        wb = XlsxWorkbook(
            partition.path,
            min_inflate_ratio=o["min_inflate_ratio"],
            max_entry_size=o["max_entry_size"],
        )
        if self._multi:
            sheet, prefix = partition.sheet, (
                partition.path,
                partition.sheet_idx,
                partition.sheet,
            )
        else:
            sheet, prefix = o["sheet_name"], (partition.path,)
        try:
            for row_idx, cells in wb.iter_rows(
                sheet, o["sheet_index"], continue_on_error=o["continue_on_error"]
            ):
                if row_idx <= o["header_row"]:
                    continue
                yield prefix + (row_idx,) + tuple(
                    cells.get(i) for i in range(self._n_cols)
                )
        finally:
            wb.close()


def register(spark) -> None:
    spark.dataSource.register(XlsxDataSource)
