"""Readers for the converter's own output formats.

A user of the reference has NDJSON / chunked-CSV / JSON-array files on
disk; these loaders bring them back as DataFrames so the relational
layer can run on them directly — closing the Extract -> query loop.
All-string schemas by default (the converter's type system, SURVEY.md
§1.2); pass ``schema=`` to type at read time.
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import DataFrame, SparkSession


def read_ndjson(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """NDJSON (one object per line) — Spark's native JSON source."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("primitivesAsString", True)
    return reader.json(path)


def read_csv_chunks(
    spark: SparkSession, temp_dir: str, input_base: str, schema: str | None = None
) -> DataFrame:
    """Reassemble a ``<base>-chunk-N.csv`` family written by the W1 sink.

    Chunks are globbed (order does not matter for the DataFrame — each
    file repeats the header, which the CSV source strips per-file).
    """
    pattern = f"{temp_dir}/{input_base}-chunk-*.csv"
    if not _glob.glob(pattern):
        raise FileNotFoundError(f"no chunk files match {pattern}")
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(pattern)


def read_json_array(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Single JSON-array file (the W3 sink) via multiLine mode."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("primitivesAsString", True)
    return reader.json(path)
