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

QUERIES = {"range_join_price_bands": range_join_price_bands}
ORACLES = {"range_join_price_bands": _RANGE_BANDS_SQL}
