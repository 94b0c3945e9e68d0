"""Oracle-checked Structured Streaming query.

``stream_tumbling_window`` runs a REAL streaming pipeline — file
source -> event-time tumbling aggregation -> memory sink, complete
mode, availableNow trigger — and returns the final snapshot. Because
complete mode emits every window and the trigger drains the finite
input, the result is deterministic and equals the batch aggregation,
so the DuckDB oracle is the SAME SQL as the batch twin
(operators/events.py events_tumbling_window). That puts the streaming
engine itself on the driver's hash-compare gate: the strongest check
that stream and batch semantics agree.

The decimal-sum convention applies unchanged: the aggregation runs
JVM-side through DECIMAL(18,2), so micro-batch accumulation order
cannot flip a half-boundary.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catme_etl_j_spark.functions.numeric import dec2, money2
from catme_etl_j_spark.operators.events import _TS_FMT, _TUMBLING_SQL

_seq = itertools.count()


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling counts/sums per event type, computed by the
    streaming engine (complete mode) over the events files."""
    from catme_etl_j_spark.streaming.events import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = read_event_stream(spark, sf_dir, glob="events.parquet")
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        money2(F.sum(dec2("value"))).alias("sum_value"), F.count("*").alias("n")
    )
    name = f"streamq_tumbling_{next(_seq)}"  # fresh sink per invocation
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name).select(
        F.date_format("w.start", _TS_FMT).alias("window_start"),
        "event_type",
        "sum_value",
        "n",
    )


QUERIES = {"stream_tumbling_window": stream_tumbling_window}

ORACLES = {"stream_tumbling_window": _TUMBLING_SQL}
