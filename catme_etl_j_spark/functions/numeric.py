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
