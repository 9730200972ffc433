"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship window-based clumping query at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via the engine's query registry
(gentropy_spark/plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gentropy_spark.plans import full_registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: distance-window clumping of the events stream."""
    from gentropy_spark.plans.genomics import q_window_clump_leads

    return q_window_clump_leads(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in full_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in full_registry().items()
        if spec.oracle is not None
    }
