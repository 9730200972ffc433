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


# The external correctness snapshot verifies the FIRST 50 ``queries()``
# entries. Rotation policy: every key whose newest driver evidence
# predates its last code change (or the last testdata format change)
# must sit inside that window; remaining keys rotate in next round.
_SNAPSHOT_PRIORITY = [
    # (z) NEW in r6 — no driver evidence exists yet.
    "dedup_clusters",
    "sample_stratified",
    "asof_join",
    "kmv_distinct",
    "scd2_intervals",
    "rollup_aggregate",
    "merge_upsert",
    "stream_enrich",
    "pack_sequences",
    "vocab_topk",
    "tfidf_topterms",
    "table_profile",
    "key_skew_profile",
    "multimodal_resize",
    "ancestry_aggregate",
    "stream_static_enrich",
    "decontaminate",
    "pii_redact",
    "corpus_curate",
    "embedding_clusters",
    "value_histogram",
    "corpus_mixture",
    "kmeans_step",
    "hopping_window_agg",
    "interval_coverage",
    "mixture_rebalance",
    "line_boilerplate",
    "stream_sliding_agg",
    # (a) r6: every key that ERRORED in the r5 snapshot (the driver's
    # testdata switched events.ts to TIMESTAMP_NTZ between r4 and r5;
    # all 35 failures shared that root cause, fixed in sources/readers
    # normalize_events_ts) — these have no green driver row on the new
    # testdata until re-checked.
    "study_locus_qc_flags",
    "sumstat_harmonise_finngen",
    "l2g_vep_features",
    "l2g_gene_features",
    "l2g_interval_features",
    "ld_index_build",
    "ld_clump_indexed",
    "pics_finemap_indexed",
    "l2g_feature_matrix",
    "l2g_score_gbm",
    "l2g_score",
    "stream_sessionize",
    "ecaviar_clpp",
    "credible_set_filter",
    "pics_finemap",
    "ld_clump",
    "window_clump_semi",
    "carma_outliers",
    "sumstat_imputation",
    "qc_gc_lambda",
    "logsum",
    "meta_analysis",
    # (b) events-ts-dependent keys outside the r5 window: their only
    # driver evidence predates the testdata format change.
]


def full_registry() -> dict[str, QuerySpec]:
    """Merge every plan module's registry (import here to avoid cycles).

    Ordering is part of the external contract: consumers that sample a
    bounded prefix (the correctness snapshot stops at 50 entries) see
    ``_SNAPSHOT_PRIORITY`` keys first, then the remaining keys in
    module order.
    """
    import importlib
    import sys

    # Import each plan module independently: one module failing to
    # import (a bad constant, an API drift) must cost only ITS keys,
    # not the whole registry — a total-failure registry zeroes every
    # driver correctness row at once, which is strictly worse than a
    # visible partial outage.
    module_names = (
        "relational",
        "genomics",
        "qc",
        "stats_kernel",
        "llm_pipeline",
        "streaming_plan",
        "l2g",
        "l2g_features",
        "variants",
        "graph_ld",
    )
    merged: dict[str, QuerySpec] = {}
    for name in module_names:
        try:
            module = importlib.import_module(f"gentropy_spark.plans.{name}")
        except Exception as exc:  # noqa: BLE001
            print(
                f"full_registry: plan module {name!r} failed to import "
                f"and its queries are UNAVAILABLE: {exc}",
                file=sys.stderr,
            )
            continue
        overlap = merged.keys() & module.REGISTRY.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        merged.update(module.REGISTRY)
    registry: dict[str, QuerySpec] = {}
    for key in _SNAPSHOT_PRIORITY:
        if key in merged:
            registry[key] = merged.pop(key)
    registry.update(merged)
    return registry
