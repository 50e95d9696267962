"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All plans live in ``pm25ml_spark.plans`` (one module per operator family,
registered via the @query decorator); this file only adapts them to the
driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the pricing-summary plan (scan → pushed filter → hash aggregate
    with exact decimal sums), the engine's spine query.
    """
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    from pm25ml_spark.plans.registry import ORACLES, load_all_plans

    load_all_plans()
    return dict(ORACLES)
