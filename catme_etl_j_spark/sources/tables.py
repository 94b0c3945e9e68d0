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


def spread_small_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Guide §2.5 input-parallelism guard: when a scan arrives as fewer
    splits than the session has cores (locally: one small parquet file;
    in production: a handful of giant unsplittable files), everything
    fused into the scan stage runs on those few tasks however many
    cores exist. Round-robin repartition to the session parallelism in
    that case; at real scale (many input files) the condition is false
    and NO exchange is added.

    Use ONLY in front of scan-stage compute that dominates the operator
    (gram/shingle generation, md5 fingerprint maps, Arrow passes) whose
    output is reshuffled or reduced afterwards — the winnow_pairs
    precedent (measured 3.0 → 0.77 s). A payload-heavy frame whose
    consumers reshuffle by key anyway gets strictly SLOWER from the
    extra exchange (the r12 _prescaled negative result: ann_nn 0.58 →
    0.93 s — see similarity.py)."""
    n_par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_par:
        return df.repartition(n_par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TimestampType regardless of how the driver
    generated the parquet. Two encodings have been observed across
    rounds: TIMESTAMP(NANOS) (rejected by Spark's vectorized reader —
    read nanos as int64, integer-divide to micros; `div`, not `/`,
    because float division loses precision above 2^53) and plain
    TIMESTAMP(MICROS) isAdjustedToUTC=false (reads as TIMESTAMP_NTZ —
    cast to TimestampType; identity on the stored micros because every
    events query sets the session zone to UTC before loading). DuckDB
    applies the same ns->us floor truncation, so parity holds."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _normalize_ts(df)


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):  # legacy nanos-as-long
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
