"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Parquet scans are the engine's canonical source: columnar, splittable,
predicate-pushdown- and column-pruning-friendly. At 100 TB these same
calls fan out across executors; nothing here is local-mode-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are constant-size; supplier/part/customer grow with SF but
# stay orders of magnitude under the fact table — still broadcastable at
# sf<=1; at 100 TB Catalyst/AQE decides from actual stats).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read nanos as int64 and integer-divide to micros
    (`div`, not `/` — float division loses precision above 2^53).
    DuckDB does the same ns->us floor truncation, so parity holds."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
