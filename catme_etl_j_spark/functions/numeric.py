"""Cross-engine-deterministic numeric helpers.

Floating-point SUMs are order-dependent, and Spark's task/partition
order differs from any oracle engine's — so two correct engines can
disagree in the last ulps, which breaks value-hash comparison and,
worse, can flip a rounding boundary. The fix used across this engine:

* All monetary aggregation is performed on DECIMAL-cast operands.
  Decimal addition is exact and associative, so the aggregate is
  bit-identical regardless of partitioning, parallelism, or engine.
  (This is also the right call at 100 TB: a sum over 10^12 rows in
  doubles can drift by whole units; decimals cannot.)
* Averages divide the exact decimal sum (cast to double) by the exact
  count in double arithmetic: same inputs -> same IEEE result -> same
  round(), on every engine.
* Final outputs are cast to DOUBLE so result schemas are stable.

The DuckDB-oracle twins of these expressions live next to each query in
the operator modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def dec2(c: Column | str) -> Column:
    """Exact 2-decimal operand (prices, balances)."""
    return F.col(c).cast(DEC2) if isinstance(c, str) else c.cast(DEC2)


def dec4(c: Column | str) -> Column:
    """Exact 4-decimal operand (rates: discount, tax)."""
    return F.col(c).cast(DEC4) if isinstance(c, str) else c.cast(DEC4)


def money2(sum_col: Column) -> Column:
    """Exact decimal aggregate -> stable DOUBLE output, 2 decimals."""
    return F.round(sum_col, 2).cast("double")


def rdet(col: Column, n: int) -> Column:
    """Engine-deterministic rounding of a DOUBLE column.

    ``round(double, n)`` is NOT portable: Spark rounds the shortest
    decimal repr (BigDecimal HALF_UP) while DuckDB rounds
    ``std::round(x*10^n)/10^n``, and they disagree whenever the value
    prints as ``x.xx5``. ``floor(x*10^n + 0.5)/10^n`` is pure IEEE
    arithmetic — identical bits on every engine. SQL twin:
    ``floor((x) * 10^n + 0.5) / 10^n``.
    """
    k = float(10**n)
    return F.floor(col * F.lit(k) + F.lit(0.5)) / F.lit(k)


def rdet_sql(expr: str, n: int) -> str:
    """DuckDB twin of :func:`rdet` (splice into oracle SQL)."""
    k = float(10**n)
    return f"floor(({expr}) * {k} + 0.5) / {k}"


def avg4(sum_col: Column, count_col: Column) -> Column:
    """Deterministic average: double(exact sum) / count, 4 decimals."""
    return rdet(sum_col.cast("double") / count_col, 4)


# Deterministic big-integer -> double conversion. A plain CAST of an
# exact integer ABOVE 2^53 to DOUBLE is ENGINE-DEPENDENT in the last
# ulp: Spark goes through Java BigDecimal.doubleValue, DuckDB converts
# its int128 representation, and the two can round the same integer to
# ADJACENT doubles (caught live: window_bollinger_bands' 20-day
# cents^2 window sum at sf0.1, one row of 2,399 where the 1-ulp input
# drift crossed an rdet rounding boundary). The fix: split the integer
# into (hi, lo) parts each exactly representable in a double, then
# recombine with one multiply + one add — both single IEEE operations
# on identical inputs, hence bit-identical on every engine. The result
# is within 2 ulp of the true value, which is immaterial for the
# variance/estimate math it feeds; what matters is that BOTH engines
# get the SAME bits. Use this for any DECIMAL(38,0) accumulator that
# can exceed 2^53 (cents^2 sums at >= sf0.1 scale qualify; plain
# cents sums stay below 2^53 until ~$90T per window and may keep the
# straight cast with a docstring note).

# 2^42 three-way split: a DECIMAL(38,0) value needs up to 127 bits, so
# TWO base-2^42 digits can't hold the head (10^38 // 2^42 ~ 2.3e25
# still overflows BIGINT — caught by the property test's 10^38-1 row);
# three digits of 42/42/<=43 bits each fit comfortably in BIGINT and
# far under 2^53, so every per-digit BIGINT->DOUBLE conversion is
# exact and the recombination is 4 fixed IEEE ops.
_DEC_SPLIT = 1 << 42


def dec2dbl(c: Column) -> Column:
    """Engine-deterministic DOUBLE of a NONNEGATIVE DECIMAL(38,0)
    column (base-2^42 digit split; see module note). SQL twin:
    dec2dbl_sql.

    GUARDED against negative inputs (ADVICE r9): Spark's % is
    sign-of-dividend while DuckDB's // truncates, so a signed value
    fed through the split would diverge SILENTLY between the engines.
    A negative row raises at execution on both sides instead (the
    raise_error branch is non-foldable, so it only fires on actual
    rows). A caller with signed accumulators splits sign first:
    sign(c) * dec2dbl(abs(c)).

    NULL passes through as NULL (ADVICE r10): a nullable accumulator
    (e.g. SUM over an empty group) must keep propagating NULL, not
    trip the negative-input guard — `c >= 0` is NULL for NULL rows
    and `otherwise` would route them to raise_error.
    """
    import pyspark.sql.functions as F

    k = float(_DEC_SPLIT)
    lo = (c % _DEC_SPLIT).cast("long")
    # (c - c%k)/k is an exact integer; Spark's decimal division keeps
    # it exact (quotient <= 10^38/2^42 ~ 2.3e25 fits DECIMAL(38,6))
    d1 = (c - (c % _DEC_SPLIT)) / _DEC_SPLIT
    mid = (d1 % _DEC_SPLIT).cast("long")
    hi = ((d1 - (d1 % _DEC_SPLIT)) / _DEC_SPLIT).cast("long")
    body = (hi.cast("double") * k * k + mid.cast("double") * k) + lo.cast("double")
    return (
        F.when(c.isNull(), F.lit(None).cast("double"))
        .when(c >= 0, body)
        .otherwise(
            F.expr(
                "CAST(raise_error('dec2dbl: negative input — the base-2^42 "
                "split is only sign-correct for nonnegative values') AS DOUBLE)"
            )
        )
    )


def dec2dbl_sql(expr: str) -> str:
    """DuckDB twin of :func:`dec2dbl` (HUGEINT // and % truncate;
    nonnegative operands make floor == trunc, convention #7; same
    loud-failure guard for negative inputs and the same NULL
    passthrough as the Spark side)."""
    k = float(_DEC_SPLIT)
    h = f"CAST({expr} AS HUGEINT)"
    body = (
        f"((CAST({h} // {_DEC_SPLIT} // {_DEC_SPLIT} AS DOUBLE) * {k} * {k}"
        f" + CAST({h} // {_DEC_SPLIT} % {_DEC_SPLIT} AS DOUBLE) * {k})"
        f" + CAST({h} % {_DEC_SPLIT} AS DOUBLE))"
    )
    return (
        f"CASE WHEN ({expr}) IS NULL THEN CAST(NULL AS DOUBLE) "
        f"WHEN ({expr}) >= 0 THEN {body} "
        f"ELSE CAST(error('dec2dbl: negative input — the base-2^42 split "
        f"is only sign-correct for nonnegative values') AS DOUBLE) END"
    )
