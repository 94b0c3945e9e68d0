"""CLI with the reference's flag surface (SURVEY.md §2.5).

Usage:
    python -m catme_etl_j_spark.converter.cli \
        --input data.xlsx --format NDJSON --output out.ndjson

Service mode (the contract's config-file launch,
HighVolumeExcelConverter-Contract-v2.0.1.md:252-267):

    python -m catme_etl_j_spark.converter.cli --config /etc/converter.yml
    CATME_CONVERTER_CONFIG=/etc/converter.yml python -m ...cli

Explicit CLI flags override config-file values (boolean flags can only
turn a config value ON — omit them to keep the file's setting).
"""

from __future__ import annotations

import argparse
import sys

from catme_etl_j_spark.converter.api import convert
from catme_etl_j_spark.converter.config import default_config_path, load_config
from catme_etl_j_spark.converter.errors import ConversionError

# applied after the config/CLI merge, so a config file value is never
# clobbered by an argparse default
_DEFAULTS = dict(
    header_row=0, batch_size=50_000, temp_dir="data/temp", min_inflate_ratio=0.01
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="catme-etl-j-spark-convert",
        description="High-volume XLSX converter (PySpark engine)",
    )
    p.add_argument("--config", help="converter.yml (service mode); CLI flags override")
    p.add_argument("--input", help="input .xlsx path or glob")
    p.add_argument("--output", help="output path (required unless --format CSV)")
    p.add_argument("--format", choices=["CSV", "NDJSON", "JSON"])
    p.add_argument("--sheetName", dest="sheet_name")
    p.add_argument("--sheet-index", dest="sheet_index", type=int)
    p.add_argument("--header-row", dest="header_row", type=int)
    p.add_argument("--batchSize", dest="batch_size", type=int)
    p.add_argument("--continueOnError", dest="continue_on_error", action="store_true")
    p.add_argument("--temp-dir", dest="temp_dir")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--pretty-print", dest="pretty_print", action="store_true")
    p.add_argument("--min-inflate-ratio", dest="min_inflate_ratio", type=float)
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
        cfg_path = args.config or default_config_path()
        merged: dict = dict(_DEFAULTS)
        if cfg_path:
            merged.update(load_config(cfg_path))
        cli_given = {
            k: v
            for k, v in vars(args).items()
            if k != "config" and v is not None and v is not False
        }
        merged.update(cli_given)
        input_ = merged.pop("input", None)
        format_ = merged.pop("format", None)
        output = merged.pop("output", None)
        if not input_ or not format_:
            print("error: --input and --format are required (flags or config)",
                  file=sys.stderr)
            return 2
        res = convert(input_, format_, output, **merged)
    except ConversionError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"rows={res.rows_written} outputs={res.outputs} elapsed={res.elapsed_s:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
