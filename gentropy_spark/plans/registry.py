"""Query registry — maps SURVEY §2 inventory keys to (spark_fn, oracle_sql).

Each plan module contributes a dict of QuerySpec; ``full_registry``
merges them. ``__spark_entry__.py`` derives ``queries()`` and
``oracle_sql()`` from this single source of truth.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One verifiable engine capability.

    Attributes:
        fn: (spark, sf_dir) -> DataFrame implementation.
        oracle: equivalent DuckDB ANSI SQL over the pre-registered
            views, or None for non-SQL-expressible operators (the
            driver then records a rows-only check).
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def full_registry() -> dict[str, QuerySpec]:
    """Merge every plan module's registry (import here to avoid cycles)."""
    from gentropy_spark.plans import (
        genomics,
        graph_ld,
        l2g,
        llm_pipeline,
        qc,
        relational,
        stats_kernel,
        streaming_plan,
        variants,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (relational, genomics, qc, stats_kernel, llm_pipeline, streaming_plan, l2g, variants, graph_ld):
        overlap = registry.keys() & module.REGISTRY.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        registry.update(module.REGISTRY)
    return registry
