"""Run any registered engine query from the command line.

Usage:
    python -m catme_etl_j_spark.run_query q01_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --format show --limit 20
    python -m catme_etl_j_spark.run_query dedup_minhash_keep \
        --sf-dir /data/sf1 --format parquet --output /tmp/dedup_out
    python -m catme_etl_j_spark.run_query --list

Every ``queries()`` entry in ``__spark_entry__`` is addressable; the
output formats map straight onto DataFrameWriter (``parquet``, ``csv``,
``ndjson`` = ``json`` lines) plus a human ``show`` mode. This is the
"switch your job to this engine" surface: the same callables the
correctness gate hash-checks, runnable as batch jobs.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="catme-etl-j-spark-query",
        description="Run a registered engine query against an sf dir",
    )
    p.add_argument("query", nargs="?", help="query name (see --list)")
    p.add_argument("--list", action="store_true", help="list query names")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--format", choices=["show", "parquet", "csv", "ndjson"],
                   default="show")
    p.add_argument("--output", help="output path (required unless --format show)")
    p.add_argument("--limit", type=int, default=20,
                   help="row cap for --format show")
    p.add_argument("--cpus", help="local[N] parallelism override")
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of executing "
        "(the PLANS.md receipt for any registered query)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    import __spark_entry__ as entry_mod

    from catme_etl_j_spark.session import get_spark

    args = build_parser().parse_args(argv)
    queries = entry_mod.queries()
    if args.list:
        for name in queries:
            print(name)
        return 0
    if not args.query:
        print("error: query name required (or --list)", file=sys.stderr)
        return 2
    if args.query not in queries:
        import difflib

        close = difflib.get_close_matches(args.query, queries, n=3)
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        print(f"error: unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2
    if args.format != "show" and not args.output:
        print("error: --output required for file formats", file=sys.stderr)
        return 2

    spark = get_spark("run_query", cpus=args.cpus)
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        from catme_etl_j_spark.plans.explain import formatted_plan

        print(formatted_plan(df))
        return 0
    if args.format == "show":
        df.show(args.limit, truncate=False)
    elif args.format == "parquet":
        df.write.mode("overwrite").parquet(args.output)
    elif args.format == "csv":
        df.write.mode("overwrite").option("header", True).csv(args.output)
    else:  # ndjson
        df.write.mode("overwrite").json(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
