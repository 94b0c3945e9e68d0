"""Physical-plan inspection helpers.

The 100 TB discipline (SURVEY.md §4, BASELINE.md): after a query is
correct, its *plan* must be the one you'd want at 1000 executors —
filters pushed into the parquet scan, small dims broadcast, expressions
inside WholeStageCodegen. These helpers make those properties
assertable in tests (tests/test_plans.py) instead of eyeballed.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> dict[str, bool]:
    plan = formatted_plan(df, mode)
    return {n: (n in plan) for n in needles}
