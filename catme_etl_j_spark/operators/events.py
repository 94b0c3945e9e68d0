"""Event-stream analytics over the ``events`` table (batch surface).

These are the batch twins of the Structured Streaming slice
(catme_etl_j_spark/streaming/): same windowing/dedup/sessionization
semantics, expressed on a bounded DataFrame so they are DuckDB-oracle
checkable. The streaming module reuses the same logic with
``readStream`` + watermarks.

Determinism notes:
* tumbling windows — ``F.window`` start rendered as a string; DuckDB
  twin is ``time_bucket``.
* sessionization — gap > 1800 s on *microsecond-exact* epoch doubles
  (``ts.cast(double)`` == DuckDB ``epoch(ts)``), then the classic
  lag/cumsum session-id assignment, which is pure window algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from catme_etl_j_spark.functions.numeric import dec2, money2
from catme_etl_j_spark.sources.tables import load_table

SESSION_GAP_S = 1800.0
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts and value sums per event type."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(money2(F.sum(dec2("value"))).alias("sum_value"), F.count("*").alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "sum_value",
            "n",
        )
    )


_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding every 15 minutes (each event lands in 2)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money2(F.sum(dec2("value"))).alias("sum_value"))
        .select(F.date_format("w.start", _TS_FMT).alias("window_start"), "n", "sum_value")
    )


# A sliding window is the union of per-offset tumbling bucketings.
_SLIDING_SQL = """
WITH slid AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts, INTERVAL '15 minutes') AS ws, value FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM slid
GROUP BY 1
"""


def events_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-dedup batch analog: first event per (user, type)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", _TS_FMT).alias("first_ts"),
        )
    )


_DEDUP_EARLIEST_SQL = """
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events) t
WHERE rn = 1
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative session ids."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("double")
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | ((epoch - prev) > SESSION_GAP_S), 1).otherwise(0)
    wc = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    with_sess = ev.withColumn("session_id", F.sum(is_new).over(wc))
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(F.date_format("ts", _TS_FMT)).alias("session_start"),
        F.max(F.date_format("ts", _TS_FMT)).alias("session_end"),
        money2(F.sum(dec2("value"))).alias("sum_value"),
    )


_SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - LAG(epoch(ts)) OVER w > {SESSION_GAP_S} THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       min(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS session_start,
       max(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS session_end,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, session_id
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction + per-key aggregation."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


QUERIES = {
    "events_tumbling_window": events_tumbling_window,
    "events_sliding_window": events_sliding_window,
    "events_dedup_earliest": events_dedup_earliest,
    "events_sessionize": events_sessionize,
    "events_json_extract": events_json_extract,
}

ORACLES = {
    "events_tumbling_window": _TUMBLING_SQL,
    "events_sliding_window": _SLIDING_SQL,
    "events_dedup_earliest": _DEDUP_EARLIEST_SQL,
    "events_sessionize": _SESSIONIZE_SQL,
    "events_json_extract": _JSON_SQL,
}
