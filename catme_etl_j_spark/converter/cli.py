"""CLI with the reference's flag surface (SURVEY.md §2.5).

Usage:
    python -m catme_etl_j_spark.converter.cli \
        --input data.xlsx --format NDJSON --output out.ndjson
"""

from __future__ import annotations

import argparse
import sys

from catme_etl_j_spark.converter.api import convert
from catme_etl_j_spark.converter.errors import ConversionError


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="catme-etl-j-spark-convert",
        description="High-volume XLSX converter (PySpark engine)",
    )
    p.add_argument("--input", required=True, help="input .xlsx path or glob")
    p.add_argument("--output", help="output path (required unless --format CSV)")
    p.add_argument("--format", required=True, choices=["CSV", "NDJSON", "JSON"])
    p.add_argument("--sheetName", dest="sheet_name")
    p.add_argument("--sheet-index", dest="sheet_index", type=int)
    p.add_argument("--header-row", dest="header_row", type=int, default=0)
    p.add_argument("--batchSize", dest="batch_size", type=int, default=50_000)
    p.add_argument("--continueOnError", dest="continue_on_error", action="store_true")
    p.add_argument("--temp-dir", dest="temp_dir", default="data/temp")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--pretty-print", dest="pretty_print", action="store_true")
    p.add_argument("--min-inflate-ratio", dest="min_inflate_ratio", type=float, default=0.01)
    # accepted-and-ignored (reference declares but never uses — SURVEY.md §2.5):
    p.add_argument("--strategy-hint", dest="strategy_hint",
                   choices=["STREAMING", "USER_MODEL_EVENT", "AUTO"])
    p.add_argument("--date-format", dest="date_format")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--mem-threshold", dest="mem_threshold", type=int)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        res = convert(
            args.input,
            args.format,
            args.output,
            sheet_name=args.sheet_name,
            sheet_index=args.sheet_index,
            header_row=args.header_row,
            batch_size=args.batch_size,
            continue_on_error=args.continue_on_error,
            temp_dir=args.temp_dir,
            overwrite=args.overwrite,
            pretty_print=args.pretty_print,
            min_inflate_ratio=args.min_inflate_ratio,
            strategy_hint=args.strategy_hint,
            date_format=args.date_format,
            verbose=args.verbose,
            mem_threshold=args.mem_threshold,
        )
    except ConversionError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"rows={res.rows_written} outputs={res.outputs} elapsed={res.elapsed_s:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
