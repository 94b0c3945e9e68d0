"""Bucketized range join vs the naive theta-join (exact equivalence)."""

import re

from pyspark.sql import functions as F

from catme_etl_j_spark.operators.rangejoin import range_join
from catme_etl_j_spark.plans.explain import formatted_plan
from catme_etl_j_spark.sources.tables import load_table


def _inputs(spark, sf_dir):
    # events.value joined into value bands derived from part prices
    left = load_table(spark, sf_dir, "events").select("event_id", "value")
    right = (
        load_table(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("band_id"),
            (F.col("p_retailprice") / 10.0 - 5.0).alias("lo"),
            (F.col("p_retailprice") / 10.0 + 5.0).alias("hi"),
        )
        .limit(50)
    )
    return left, right


def test_range_join_matches_naive(spark, sf_dir):
    left, right = _inputs(spark, sf_dir)
    fast = range_join(
        left, right, left_val="value", right_lo="lo", right_hi="hi", bucket_width=7.0
    )
    naive = left.join(
        right, (left.value >= right.lo) & (left.value <= right.hi)
    )
    a = {(r["event_id"], r["band_id"]) for r in fast.collect()}
    b = {(r["event_id"], r["band_id"]) for r in naive.collect()}
    assert a == b and len(a) > 0


def test_range_join_bucket_width_invariance(spark, sf_dir):
    left, right = _inputs(spark, sf_dir)
    results = []
    for w in (1.0, 13.0, 100.0):
        df = range_join(
            left, right, left_val="value", right_lo="lo", right_hi="hi", bucket_width=w
        )
        results.append({(r["event_id"], r["band_id"]) for r in df.collect()})
    assert results[0] == results[1] == results[2]


def test_range_join_avoids_nested_loop(spark, sf_dir):
    left, right = _inputs(spark, sf_dir)
    fast = range_join(
        left, right, left_val="value", right_lo="lo", right_hi="hi", bucket_width=7.0
    )
    assert "BroadcastNestedLoopJoin" not in formatted_plan(fast)
    naive = left.join(right, (left.value >= right.lo) & (left.value <= right.hi))
    assert "BroadcastNestedLoopJoin" in formatted_plan(naive)


def test_empty_and_inverted_intervals(spark, sf_dir):
    left, _ = _inputs(spark, sf_dir)
    right = spark.createDataFrame(
        [(1, 50.0, 40.0)], "band_id long, lo double, hi double"  # hi < lo
    )
    df = range_join(
        left, right, left_val="value", right_lo="lo", right_hi="hi", bucket_width=5.0
    )
    assert df.count() == 0


def test_range_join_rejects_outer(spark):
    import pytest

    from catme_etl_j_spark.operators.rangejoin import range_join

    left = spark.range(3).withColumnRenamed("id", "v")
    right = spark.range(2).selectExpr("id as lo", "id + 1 as hi")
    with pytest.raises(ValueError, match="inner"):
        range_join(left, right, left_val="v", right_lo="lo", right_hi="hi",
                   bucket_width=1.0, how="left")


def test_session_peak_overlap_bounds(spark, sf_dir):
    """Overlap per session is capped by the peak hour's length, so the
    day total is bounded by n_sessions * 3600."""
    from catme_etl_j_spark.operators.rangejoin import range_join_session_peak

    rows = range_join_session_peak(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_sessions_at_peak"] >= 0
        assert 0 <= r["total_overlap_s"] <= r["n_sessions_at_peak"] * 3600
        assert r["peak_hour"].startswith(r["day"])
