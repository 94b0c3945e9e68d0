"""Generic as-of join vs pandas merge_asof (the semantics oracle)."""

import pandas as pd

from pyspark.sql import functions as F

from catme_etl_j_spark.operators.asof import asof_join
from catme_etl_j_spark.sources.tables import load_table


def test_asof_join_matches_merge_asof(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    got = asof_join(left, right, on="ts", by="user_id").toPandas()

    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    rp["matched_ts"] = rp["ts"]  # merge_asof drops the right 'on' column
    want = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")

    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["ts_right"], want["matched_ts"].rename("ts_right"), check_exact=True
    )
    pd.testing.assert_series_equal(
        got["view_value_right"],
        want["view_value"].rename("view_value_right"),
        check_exact=True,
    )


def test_asof_join_no_prior_match_is_null(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    # right side starting after all lefts -> every match null
    right = ev.filter(F.col("event_type") == "view").select("user_id", "ts").filter(
        F.col("ts") > F.lit("2999-01-01").cast("timestamp")
    )
    got = asof_join(left, right, on="ts", by="user_id", right_cols=[])
    assert got.count() == left.count()
    assert got.filter(F.col("ts_right").isNotNull()).count() == 0


def test_nearest_view_picks_smaller_gap(spark, sf_dir):
    """Nearest must agree with backward/forward where both exist: the
    chosen gap is <= the gap of either one-sided match."""
    from catme_etl_j_spark.operators.asof import asof_nearest_view

    rows = asof_nearest_view(spark, sf_dir).collect()
    assert rows
    assert {r["direction"] for r in rows} == {"backward", "forward"}
    for r in rows:
        assert r["gap_us"] >= 0
        assert r["view_ts"] is not None
