"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship multi-hop join at sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared inventory from
``odsc_agentic_ai_summit_2025_spark.plans`` (SURVEY.md §2 coverage).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odsc_agentic_ai_summit_2025_spark.plans import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from odsc_agentic_ai_summit_2025_spark.plans.relational import (
        q09_multihop_revenue,
    )

    return q09_multihop_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
