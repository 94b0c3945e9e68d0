"""Property tests for the cross-engine determinism primitives.

These pin the CONVENTIONS themselves (functions/numeric.py + the
portable-hash formula) against DuckDB with hypothesis-generated
inputs — no Spark session needed, so they run in milliseconds. The
full Spark-vs-DuckDB agreement is covered by tools/selfcheck.py; here
we prove the Python reference, the SQL splice, and DuckDB's evaluator
agree on the exact arithmetic the whole repo builds on.
"""

import hashlib
import math

import duckdb
from hypothesis import given, settings, strategies as st

from catme_etl_j_spark.functions.numeric import rdet_sql


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_rdet_sql_matches_python_reference(x, n):
    """floor(x*10^n + 0.5)/10^n is pure IEEE: DuckDB evaluates the
    spliced SQL to exactly the Python float result."""
    # CAST the literal like real call sites: rdet_sql always splices
    # over DOUBLE expressions (a bare high-precision literal would
    # parse as DECIMAL and overflow the *10^n in decimal arithmetic)
    got = duckdb.sql(
        f"SELECT {rdet_sql(f'CAST({x!r} AS DOUBLE)', n)}"
    ).fetchone()[0]
    k = float(10 ** n)
    want = math.floor(x * k + 0.5) / k
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"),
               max_size=40))
def test_portable_hash_matches_python(s):
    """int(md5[:8], 16) — the repo's portable 32-bit hash — agrees
    between DuckDB's md5()::BIGINT path and Python's hashlib."""
    got = duckdb.sql(
        "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT", params=[s]
    ).fetchone()[0]
    want = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.decimals(min_value=-99999, max_value=99999, places=2))
def test_decimal_sum_cast_double_is_exact(d):
    """A DECIMAL(18,2) value cast to DOUBLE is exact (scale fits in
    the 53-bit mantissa), so money2's round-then-cast cannot drift."""
    got = duckdb.sql(
        f"SELECT CAST(CAST('{d}' AS DECIMAL(18,2)) AS DOUBLE)"
    ).fetchone()[0]
    assert got == float(d)


@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40)
)
@settings(max_examples=50, deadline=None)
def test_doubled_median_matches_python_reference(vals):
    """The stats._median2 doubled-integer median (odd: 2*mid; even:
    lo+hi) equals 2 * statistics.median for any int list — verified via
    the same SQL shape the oracle uses, on DuckDB (no Spark session
    needed for the arithmetic identity)."""
    import statistics

    rows = ", ".join(f"(1, {v}, {i})" for i, v in enumerate(vals))
    sql = f"""
WITH base(k, v, id) AS (VALUES {rows}),
r AS (
  SELECT k, v,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY v, id) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS cnt
  FROM base)
SELECT CAST(SUM(CASE WHEN cnt % 2 = 1 THEN 2 * v ELSE v END) AS BIGINT)
FROM r
WHERE (cnt % 2 = 1 AND rn = (cnt + 1) // 2)
   OR (cnt % 2 = 0 AND (rn = cnt // 2 OR rn = cnt // 2 + 1))
"""
    [(got,)] = duckdb.sql(sql).fetchall()
    assert got == round(2 * statistics.median(vals))


def test_dec2dbl_cross_engine_identical(spark):
    """The hi/lo split conversion yields BIT-IDENTICAL doubles on
    Spark and DuckDB for integers around and far above 2^53 — exactly
    the range where the plain DECIMAL->DOUBLE cast diverges by 1 ulp
    between the engines (the window_bollinger_bands sf0.1 catch). Also
    pins the accuracy bound: within a few ulp of Python's correctly-
    rounded conversion (bit-identity across engines is the real
    contract; closeness just guards against a broken split)."""
    import math

    import duckdb

    from catme_etl_j_spark.functions.numeric import dec2dbl, dec2dbl_sql
    from pyspark.sql import functions as F

    vals = [
        0,
        1,
        (1 << 53) - 1,
        1 << 53,
        (1 << 53) + 1,
        47747294973307403210,  # the live sf0.1 mismatch's sxx
        10**38 - 1,
        123456789012345678901234567,
    ]
    sdf = spark.createDataFrame(
        [(str(v),) for v in vals], "s string"
    ).select(
        F.col("s"),
        dec2dbl(F.col("s").cast("decimal(38,0)")).alias("d"),
    )
    got_spark = {r["s"]: r["d"] for r in sdf.collect()}
    con = duckdb.connect()
    for v in vals:
        [(got_duck,)] = con.execute(
            f"SELECT {dec2dbl_sql(f'CAST({v} AS DECIMAL(38,0))')}"
        ).fetchall()
        assert got_spark[str(v)] == got_duck, v  # bit-identical
        exact = float(v)
        if exact > 0:
            assert abs(got_duck - exact) <= 8 * math.ulp(exact), v


def test_dec2dbl_negative_input_raises_on_both_engines(spark):
    """ADVICE r9: the split is only sign-correct for nonnegative
    inputs (Spark % is sign-of-dividend, DuckDB // truncates), so a
    signed value must FAIL LOUDLY on both engines instead of silently
    diverging — and the guard must not fire on nonnegative rows."""
    import duckdb
    import pytest

    from catme_etl_j_spark.functions.numeric import dec2dbl, dec2dbl_sql
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([("-7",)], "s string").select(
        dec2dbl(F.col("s").cast("decimal(38,0)")).alias("d")
    )
    with pytest.raises(Exception, match="dec2dbl: negative input"):
        sdf.collect()
    con = duckdb.connect()
    with pytest.raises(Exception, match="dec2dbl: negative input"):
        con.execute(f"SELECT {dec2dbl_sql('CAST(-7 AS DECIMAL(38,0))')}").fetchall()
    # guard is per-row: a nonnegative frame is untouched
    ok = spark.createDataFrame([("7",)], "s string").select(
        dec2dbl(F.col("s").cast("decimal(38,0)")).alias("d")
    )
    assert ok.first()["d"] == 7.0
    [(got,)] = con.execute(
        f"SELECT {dec2dbl_sql('CAST(7 AS DECIMAL(38,0))')}"
    ).fetchall()
    assert got == 7.0
