"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator with its DuckDB
oracle (see SURVEY.md §2 and §7 for the inventory this covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from catme_etl_j_spark.operators.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def _modules():
    from catme_etl_j_spark.operators import relational

    mods = [relational]
    for name in (
        "relational2",
        "relational3",
        "sketch",
        "ranking",
        "etl",
        "embed",
        "graph",
        "text",
        "corpus",
        "dedup",
        "similarity",
        "events",
        "asof",
        "rangejoin",
        "multimodal",
        "convertq",
        "streamq",
    ):
        try:
            mod = __import__(f"catme_etl_j_spark.operators.{name}", fromlist=[name])
            mods.append(mod)
        except ImportError:
            pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
