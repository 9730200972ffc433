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
    # (a) r8: NEW this round — no driver evidence exists yet.
    "gwas_study_ingest",
    "gwas_study_split",
    "gwas_study_curation",
    "eqtl_study_ingest",
    "eqtl_sumstat_ingest",
    "decode_study_ingest",
    "intervals_epiraction_ingest",
    "panukbb_ld_align",
    "gwas_top_hits",
    "finngen_meta_study_ingest",
    "finngen_sumstat_ingest",
    "gwas_sumstat_ingest",
    "ukb_ppp_study_ingest",
    "ot_variant_to_vcf",
    "bpe_pair_counts",
    "dsir_importance",
    "variant_effect_normalise",
    "credible_set_confidence",
    "drug_enrichment",
    "evidence_vs_gold_standard",
    # (b) r8: values / plans changed this round — must re-certify.
    # gnomad: id_was_hashed now covers both hashed branches (advisory
    # fix, value change); qc_flags: shared-base + range-window rewrite
    # (hash-identical by design, re-prove it).
    "gnomad_variant_ingest",
    "study_locus_qc_flags",
    # (c) freshness rotation: keys whose LATEST driver sample is r5 or
    # older, re-verified in-repo since but stale at the driver.
    "allele_direction",
    "complex_set_match",
    "contig_validation",
    "credible_set_qc",
    "dedup_simhash_pairs",
    "direction_concordance",
    "doc_fingerprint",
    "enrichment_odds_ratio",
    "exclude_region",
    "harmonic_sum",
    "interval_evidence",
    "l2g_coloc_features",
    "l2g_gold_standard",
    "ld_block_slice",
    "locus_breaker",
    "multimodal_decode",
    "multimodal_frame_sample",
    "ontology_closure",
    "overlap_join",
    "pairwise_ld",
    "pivot_wide",
    "props_json_parse",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_decile_stats",
    "stream_dedup",
    "stream_window_agg",
    "study_index_validate",
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
