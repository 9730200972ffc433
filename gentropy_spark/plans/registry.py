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


# Keys the external correctness snapshot has never covered: its window
# is the FIRST 50 ``queries()`` entries, so these are ordered first.
# Keys checked in earlier snapshots (r1/r2 artifacts) rotate to the
# tail — their evidence already exists.
_SNAPSHOT_PRIORITY = [
    "susie_inf_finemap",
    "carma_shotgun_finemap",
    "susie_finemapper_step",
    "sumstat_harmonise_full",
    "vep_consequence_annotate",
    "ld_block_slice",
    "ann_ivf_topk",
    "interval_evidence",
    "study_index_validate",
    "l2g_coloc_features",
    "l2g_score_gbm",
    "text_langid",
    "token_count",
    "doc_fingerprint",
    "text_repetition",
    "text_logfreq",
    "dedup_simhash_pairs",
    "stream_sessionize",
    "stream_dedup",
    "stream_window_agg",
    "multimodal_decode",
    "multimodal_frame_sample",
    "v2g_distance",
    "l2g_feature_matrix",
    "l2g_score",
    "study_validation",
    "props_json_parse",
    "enrichment_odds_ratio",
    "l2g_gold_standard",
    "variant_id_normalize",
    "credible_set_qc",
    "allele_direction",
    "direction_concordance",
    "contig_validation",
    "ontology_closure",
    "pairwise_ld",
]


def full_registry() -> dict[str, QuerySpec]:
    """Merge every plan module's registry (import here to avoid cycles).

    Ordering is part of the external contract: consumers that sample a
    bounded prefix (the correctness snapshot stops at 50 entries) see
    ``_SNAPSHOT_PRIORITY`` keys first, then the remaining keys in
    module order.
    """
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

    merged: dict[str, QuerySpec] = {}
    for module in (relational, genomics, qc, stats_kernel, llm_pipeline, streaming_plan, l2g, variants, graph_ld):
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
