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
