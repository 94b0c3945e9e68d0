"""Bucketized range join — the second operator Spark lacks natively
(with as-of join, operators/asof.py).

``left.val BETWEEN right.lo AND right.hi`` naively plans as a
broadcast-nested-loop (O(|L| * |R|)); at 100 TB that's fatal. The
standard fix: overlap-bucket both sides on a fixed bucket width and
equi-join on the bucket id, then post-filter the exact predicate.
Each right interval lands in ceil((hi-lo)/w)+1 buckets; each left value
in exactly one — the join becomes a co-partitioned hash join whose cost
tracks the true match density instead of the cross product.

Correctness is bucket-width-independent (the post-filter is exact);
width only tunes duplication vs selectivity. tests/test_rangejoin.py
proves equivalence against the naive plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``left[left_val]`` falls in ``[right_lo, right_hi]``.

    Columns of both inputs are preserved (names must not collide apart
    from the join helpers). Intervals with hi < lo match nothing.

    Only ``how='inner'`` is supported: the exact BETWEEN predicate is
    applied as a post-filter, which would silently drop the null-padded
    rows of any outer variant and degenerate it to inner results.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only: the exact-predicate "
            f"post-filter would drop outer null rows (got {how!r})"
        )
    lb = F.floor(F.col(left_val) / bucket_width).cast("long")
    l_b = left.withColumn("_bucket", lb)

    lo_b = F.floor(F.col(right_lo) / bucket_width).cast("long")
    hi_b = F.floor(F.col(right_hi) / bucket_width).cast("long")
    r_b = (
        right.withColumn("_lo_b", lo_b)
        .withColumn("_hi_b", hi_b)
        .filter(F.col(right_hi) >= F.col(right_lo))
        .withColumn(
            "_bucket",
            F.explode(F.expr("sequence(_lo_b, _hi_b)")),
        )
        .drop("_lo_b", "_hi_b")
    )
    joined = l_b.join(r_b, "_bucket", how).filter(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi))
    )
    return joined.drop("_bucket")


# ---------------------------------------------------------------------------
# Oracle-gate query: the bucketized range join driven end-to-end.
# ---------------------------------------------------------------------------

_BAND_W = 25_000.0
_N_BANDS = 24  # overlapping [i*25k, i*25k + 49999.99] covers o_totalprice


def range_join_price_bands(spark, sf_dir: str) -> DataFrame:
    """Orders joined into OVERLAPPING price bands ([i*25k, i*25k+50k),
    step 25k — most orders land in two bands) via the bucketized
    :func:`range_join`, then aggregated per band. Overlap makes each
    right interval explode into multiple buckets, exercising the
    multi-bucket path; the DuckDB oracle runs the plain BETWEEN join.
    """
    from catme_etl_j_spark.functions.numeric import dec2, money2
    from catme_etl_j_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    bands = spark.range(_N_BANDS).select(
        F.col("id").alias("band_id"),
        (F.col("id") * _BAND_W).alias("lo"),
        (F.col("id") * _BAND_W + 49_999.99).alias("hi"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = range_join(
        orders,
        bands,
        left_val="o_totalprice",
        right_lo="lo",
        right_hi="hi",
        bucket_width=_BAND_W,
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_orders"),
        money2(F.sum(dec2("o_totalprice"))).alias("sum_price"),
    )


_RANGE_BANDS_SQL = f"""
WITH bands AS (
  SELECT i AS band_id, i * {_BAND_W} AS lo, i * {_BAND_W} + 49999.99 AS hi
  FROM range(0, {_N_BANDS}) t(i))
SELECT band_id, COUNT(*) AS n_orders,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
GROUP BY band_id
"""

def range_join_session_peak(spark, sf_dir: str) -> DataFrame:
    """Temporal interval-overlap join: each user session (30-min-gap
    logic shared with events_sessionize) against its day's PEAK HOUR
    (the hour with the most events) — per day, how many sessions touch
    the peak and for how long in total.

    Scale shape: sessions bucket onto the days they span (explode by
    day — sessions are short, so fan-out is ~1); the peak-hour side is
    ONE row per day, so the interval join is a co-partitioned equi-join
    on day followed by the exact overlap filter — the same
    bucketize-then-filter discipline as :func:`range_join`, with day as
    the bucket. Nothing is quadratic.

    Determinism: epochs truncate to whole seconds (CAST AS BIGINT both
    engines), overlap = min(e, ph+3600) - max(s, ph) counted when
    STRICTLY positive; peak-hour ties break on the earlier hour.
    """
    from pyspark.sql import Window as W

    from catme_etl_j_spark.operators.events import with_session_ids
    from catme_etl_j_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    sess = (
        with_session_ids(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").cast("long").alias("s"),
            F.max("ts").cast("long").alias("e"),
        )
    )
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    wp = W.partitionBy("day").orderBy(F.desc("n"), F.asc("hour"))
    peaks = (
        hourly.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("day", F.col("hour").cast("long").alias("ph"))
    )
    # bucket sessions onto the days they span, then equi-join on day
    sdays = sess.select(
        "user_id",
        "session_id",
        "s",
        "e",
        F.explode(
            F.expr("sequence(to_date(from_unixtime(s)), to_date(from_unixtime(e)))")
        ).alias("day"),
    )
    j = sdays.join(peaks, "day")
    overlap = F.least(F.col("e"), F.col("ph") + 3600) - F.greatest(F.col("s"), F.col("ph"))
    return (
        j.select("day", "ph", overlap.alias("ov"))
        .groupBy("day", "ph")
        .agg(
            F.sum(F.when(F.col("ov") > 0, 1).otherwise(0)).cast("long").alias(
                "n_sessions_at_peak"
            ),
            F.sum(F.when(F.col("ov") > 0, F.col("ov")).otherwise(0)).cast("long").alias(
                "total_overlap_s"
            ),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.date_format(F.expr("from_unixtime(ph)"), "yyyy-MM-dd HH:mm:ss").alias(
                "peak_hour"
            ),
            "n_sessions_at_peak",
            "total_overlap_s",
        )
        .orderBy("day")
    )


def _session_peak_sql() -> str:
    from catme_etl_j_spark.operators.events import session_sql_ctes

    return f"""
WITH {session_sql_ctes()},
intervals AS (
  SELECT user_id, session_id,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS s,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) AS e
  FROM sess GROUP BY user_id, session_id
),
hourly AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
peaks AS (
  SELECT day, CAST(floor(epoch(hour)) AS BIGINT) AS ph
  FROM (SELECT day, hour, n,
               row_number() OVER (PARTITION BY day ORDER BY n DESC, hour ASC) AS rn
        FROM hourly) t
  WHERE rn = 1
),
sdays AS (
  SELECT i.user_id, i.session_id, i.s, i.e,
         CAST(make_timestamp(i.s * 1000000)::DATE + CAST(u.off AS INTEGER) AS DATE) AS day
  FROM intervals i,
       LATERAL (SELECT unnest(range(0, datediff('day', make_timestamp(i.s * 1000000)::DATE,
                                    make_timestamp(i.e * 1000000)::DATE) + 1)) AS off) u
),
j AS (
  SELECT sd.day, p.ph,
         least(sd.e, p.ph + 3600) - greatest(sd.s, p.ph) AS ov
  FROM sdays sd JOIN peaks p ON sd.day = p.day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       strftime(make_timestamp(ph * 1000000), '%Y-%m-%d %H:%M:%S') AS peak_hour,
       CAST(SUM(CASE WHEN ov > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions_at_peak,
       CAST(SUM(CASE WHEN ov > 0 THEN ov ELSE 0 END) AS BIGINT) AS total_overlap_s
FROM j
GROUP BY day, ph
ORDER BY day
"""


def range_month_in_flight(spark, sf_dir: str) -> DataFrame:
    """Interval-overlap concurrency by calendar month: each lineitem is
    'in flight' over [o_orderdate, l_shipdate]; per overlapped month,
    open lines, distinct open orders, and open quantity — the
    backlog/concurrency-over-time archetype (events' peak-concurrency
    at month grain over a date-interval fact).

    Scale shape — SWEEP LINE, not explode: the fixture intervals
    average 27 months, so the naive explode-per-overlapped-month plan
    materializes ~28x the fact table (measured 11 s at sf0.1 and
    growing with span length, not data). Instead each interval emits
    exactly TWO delta events (+1/+qty at its start month, -1/-qty at
    end month + 1; per-ORDER intervals likewise for the distinct-order
    count), deltas map-side combine to |months| keys, and a running sum
    over the ~84-row month spine recovers the concurrency (that final
    single-partition window is over |months| rows — constant — not
    data). Inverted intervals (ship < order) are dropped explicitly,
    the :func:`range_join` contract.

    The DuckDB oracle deliberately keeps the NAIVE overlap-join
    formulation, so the gate also proves sweep-line == explode.

    Determinism: month arithmetic on DATEs (TZ-free), 'yyyy-MM' string
    output (convention #3); quantity deltas accumulate in DECIMAL.
    """
    from pyspark.sql import Window as W

    from catme_etl_j_spark.functions.numeric import money2
    from catme_etl_j_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.to_date("l_shipdate").alias("ship")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("ordered")
    )
    spans = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("ship") >= F.col("ordered"))
        .select(
            "l_orderkey",
            F.expr("CAST(l_quantity AS DECIMAL(18,2))").alias("qty"),
            F.expr("trunc(ordered, 'MM')").alias("m0"),
            F.expr("trunc(ship, 'MM')").alias("m1"),
        )
        # three consumers (line deltas, order spans, spine bounds) re-run
        # this join; a localCheckpoint barrier measured NO win at sf0.1
        # (1.19 s vs 1.22 s — the scans are cheap linear work), so the
        # plan stays fully lazy.
    )
    line_ev = spans.select(
        F.explode(
            F.expr(
                "array(named_struct('m', m0, 'dl', 1L, 'dq', qty),"
                " named_struct('m', add_months(m1, 1), 'dl', -1L, 'dq', -qty))"
            )
        ).alias("e")
    ).select("e.m", "e.dl", "e.dq")
    ldelta = line_ev.groupBy("m").agg(
        F.sum("dl").alias("dl"), F.sum("dq").alias("dq")
    )
    order_ev = (
        spans.groupBy("l_orderkey")
        .agg(F.min("m0").alias("m0"), F.max("m1").alias("m1"))
        .select(
            F.explode(
                F.expr(
                    "array(named_struct('m', m0, 'do', 1L),"
                    " named_struct('m', add_months(m1, 1), 'do', -1L))"
                )
            ).alias("e")
        )
        .select("e.m", "e.do")
    )
    odelta = order_ev.groupBy("m").agg(F.sum("do").alias("do"))
    spine = spans.agg(F.min("m0").alias("lo"), F.max("m1").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("m")
    )
    w = W.orderBy("m").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = (
        spine.join(ldelta, "m", "left")
        .join(odelta, "m", "left")
        .select(
            "m",
            F.sum(F.coalesce("dl", F.lit(0))).over(w).cast("long").alias("n_open_lines"),
            F.sum(F.coalesce("do", F.lit(0))).over(w).cast("long").alias("n_open_orders"),
            F.sum(F.coalesce(F.col("dq"), F.expr("CAST(0 AS DECIMAL(18,2))"))).over(w).alias("oq"),
        )
    )
    return (
        cum.filter(F.col("n_open_lines") > 0)
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "n_open_lines",
            "n_open_orders",
            money2(F.col("oq")).alias("open_qty"),
        )
        .orderBy("month")
    )


_MONTH_IN_FLIGHT_SQL = """
WITH spans AS (
  SELECT l.l_orderkey, l.l_quantity,
         unnest(generate_series(date_trunc('month', CAST(o.o_orderdate AS DATE)),
                                date_trunc('month', CAST(l.l_shipdate AS DATE)),
                                INTERVAL 1 MONTH)) AS month_start
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE))
SELECT strftime(month_start, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_open_lines,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_open_orders,
       CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS open_qty
FROM spans
GROUP BY month
ORDER BY month
"""


QUERIES = {
    "range_join_price_bands": range_join_price_bands,
    "range_join_session_peak": range_join_session_peak,
    "range_month_in_flight": range_month_in_flight,
}
ORACLES = {
    "range_join_price_bands": _RANGE_BANDS_SQL,
    "range_join_session_peak": _session_peak_sql(),
    "range_month_in_flight": _MONTH_IN_FLIGHT_SQL,
}
