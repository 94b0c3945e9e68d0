"""Distinct-counting sketches (100 TB posture: estimate, don't shuffle).

At 100 TB an exact COUNT(DISTINCT x) over a high-cardinality column
shuffles every distinct value; a HyperLogLog sketch reduces the same
question to a 4096-row aggregate (per-bucket max of a rank), which
map-side combines to ~32 KB per task regardless of input size.

Spark's builtin ``approx_count_distinct`` is HLL++ too, but its hash
(xxhash64 of Catalyst's internal row) can't be reproduced in another
engine, so it can't sit on this repo's cross-engine oracle gate. This
module implements a *portable* HLL whose every step — md5-derived
bucket/rank, exact integer 2^(49-rho) accumulation, literal-identical
estimator arithmetic — is bit-reproducible in DuckDB SQL:

* 64-bit material: md5 hex chars 1-12 (48 rank bits), chars 13-15
  (12 bucket bits, m = 4096 buckets).
* rho = leading-zero-bits(48-bit word) + 1, computed with string ops
  (strip leading '0' hex chars + a 16-way CASE on the first nonzero
  char) — identical on any engine, no float log2 edge cases.
* The harmonic sum uses exact int64 arithmetic: sum(2^(49-rho)) plus
  2^49 per empty bucket, then ONE int->double conversion (both
  engines round-to-nearest identically) and one division.
* Small-range (linear counting) correction when E <= 2.5m and empty
  buckets exist — at sf0.001 the corpus lands in that branch and at
  sf0.01 in the raw-HLL branch, so the gate exercises both paths.

The reference (waldfalke/catme-etl-j) has no analytics operators
(SURVEY.md §2.4); this is part of the engine's own training-data
pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catme_etl_j_spark.sources.tables import load_table

HLL_P = 12  # bucket bits
HLL_M = 1 << HLL_P  # 4096 buckets
_POW49 = 1 << 49  # rank material is 48 bits; rho in [1, 49]

# leading-zero-bits of the first nonzero hex char (then +1 for rho)
_NIBBLE_CASE = (
    "CASE WHEN {c} = '1' THEN 3 WHEN {c} IN ('2','3') THEN 2 "
    "WHEN {c} IN ('4','5','6','7') THEN 1 ELSE 0 END"
)

# Estimator constants, written as literal arithmetic so both engines
# evaluate the identical double: alpha_m * m^2 for m = 4096.
_ALPHA_M2 = "0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0"


def _rho_case(z: str, dialect: str = "spark") -> str:
    """rho from the 12 leading hex chars: 4*(zero hex chars) +
    (zero bits in first nonzero nibble) + 1; all-zero word -> 49."""
    t = f"trim(LEADING '0' FROM {z})" if dialect == "spark" else f"ltrim({z}, '0')"
    c = f"substr({t}, 1, 1)"
    return (
        f"CASE WHEN {t} = '' THEN 49 "
        f"ELSE 4 * (12 - length({t})) + {_NIBBLE_CASE.format(c=c)} + 1 END"
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 3-gram shingles of documents.text — the high-cardinality
    stream whose distinct count the sketch estimates.

    Staged per the Catalyst hygiene rules (see tests/test_plans.py):
    ``ws`` is its own column so the transform lambda's three lookups
    don't re-run split(); explode_outer + isNotNull on the generator
    OUTPUT keeps InferFiltersFromGenerate from inlining the pipeline.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("ws", F.split(F.trim("text"), " +"))
        .withColumn(
            "sh",
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 2, 0)),"
                " i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"
            ),
        )
        .select(F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-HLL distinct-shingle estimate vs the exact count.

    Plan shape: one pass over the shingle stream computing (bucket,
    rho); groupBy(bucket).max(rho) map-side combines to <=4096 rows
    per task before the (tiny) shuffle; the exact COUNT(DISTINCT) twin
    rides the same scan. Output is one row with the exact count, the
    estimate, buckets used, and the relative error in percent.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sh = _shingles(spark, sf_dir).withColumn("h", F.md5("shingle"))
    tagged = sh.select(
        "shingle",
        F.expr("CAST(conv(substr(h, 13, 3), 16, 10) AS INT)").alias("bucket"),
        F.expr(_rho_case("substr(h, 1, 12)")).alias("rho"),
    )
    buckets = tagged.groupBy("bucket").agg(F.max("rho").alias("mr"))
    hll = buckets.agg(
        F.expr("SUM(shiftleft(1L, 49 - mr))").alias("sum_int"),
        F.count("*").alias("nb"),
    ).select(
        F.expr(
            f"CAST(sum_int + CAST(4096 - nb AS BIGINT) * {_POW49}L AS DOUBLE)"
            f" / {float(_POW49)}"
        ).alias("s_harm"),
        F.expr("CAST(4096 - nb AS BIGINT)").alias("v_empty"),
        F.col("nb").alias("n_buckets_used"),
    ).select(
        F.expr(
            f"CASE WHEN {_ALPHA_M2} / s_harm <= 2.5 * 4096.0 AND v_empty > 0"
            f" THEN 4096.0 * ln(4096.0 / CAST(v_empty AS DOUBLE))"
            f" ELSE {_ALPHA_M2} / s_harm END"
        ).alias("est_raw"),
        "n_buckets_used",
    )
    exact = sh.agg(F.countDistinct("shingle").alias("n_exact"))
    return (
        exact.join(F.broadcast(hll))
        .select(
            "n_exact",
            F.expr("CAST(floor(est_raw + 0.5) AS BIGINT)").alias("hll_estimate"),
            "n_buckets_used",
            F.expr(
                "CAST(floor((CAST(floor(est_raw + 0.5) AS BIGINT) - n_exact)"
                " / CAST(n_exact AS DOUBLE) * 100.0 * 100.0 + 0.5) / 100.0 AS DOUBLE)"
            ).alias("rel_err_pct"),
        )
    )


_HLL_SQL = f"""
WITH sh AS (
  SELECT md5(shingle) AS h, shingle FROM (
    SELECT unnest(list_transform(
             range(1, greatest(len(ws) - 2, 0) + 1),
             i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS shingle
    FROM (SELECT regexp_split_to_array(trim(text), ' +') AS ws FROM documents) w) u
  WHERE shingle IS NOT NULL),
tagged AS (
  SELECT ('0x' || substr(h, 13, 3))::BIGINT AS bucket,
         {_rho_case("substr(h, 1, 12)", dialect="duck")} AS rho
  FROM sh),
buckets AS (
  SELECT bucket, max(rho) AS mr FROM tagged GROUP BY bucket),
hll AS (
  SELECT CAST(SUM(1::BIGINT << (49 - mr)) + (4096 - COUNT(*))::BIGINT * {_POW49} AS DOUBLE)
           / {float(_POW49)} AS s_harm,
         (4096 - COUNT(*))::BIGINT AS v_empty,
         COUNT(*) AS n_buckets_used
  FROM buckets),
est AS (
  SELECT CASE WHEN {_ALPHA_M2} / s_harm <= 2.5 * 4096.0 AND v_empty > 0
              THEN 4096.0 * ln(4096.0 / CAST(v_empty AS DOUBLE))
              ELSE {_ALPHA_M2} / s_harm END AS est_raw,
         n_buckets_used
  FROM hll),
exact AS (SELECT COUNT(DISTINCT shingle) AS n_exact FROM sh)
SELECT n_exact,
       CAST(floor(est_raw + 0.5) AS BIGINT) AS hll_estimate,
       n_buckets_used,
       CAST(floor((CAST(floor(est_raw + 0.5) AS BIGINT) - n_exact)
             / CAST(n_exact AS DOUBLE) * 100.0 * 100.0 + 0.5) / 100.0 AS DOUBLE) AS rel_err_pct
FROM exact, est
"""


QUERIES = {
    "sketch_hll_distinct": sketch_hll_distinct,
}

ORACLES = {
    "sketch_hll_distinct": _HLL_SQL,
}
