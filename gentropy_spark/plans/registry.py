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
    # (a) r7: NEW this round — no driver evidence exists yet.
    "eqtl_susie_ingest",
    "ukb_ppp_harmonise",
    "target_index_build",
    "finemap_calibration",
    "amino_acid_variants",
    "biosample_index_merge",
    "gnomad_variant_ingest",
    "intervals_e2g_ingest",
    "ukbiobank_study_ingest",
    "decode_aptamer_ingest",
    "decode_sumstat_harmonise",
    "lm_perplexity",
    "finngen_study_ingest",
    "vep_variant_index_ingest",
    "lof_curation_ingest",
    "finngen_finemapping_ingest",
    # (b) r7: the 9 r6 hash-FAILs + the latent 10th (funnel_analysis,
    # below in (c)) — values were exact, the physical dtype diverged
    # (DuckDB HUGEINT / Spark DECIMAL vs the pandas bridge); oracle/
    # engine dtypes are now cast-aligned and must re-certify.
    "kmv_distinct",
    "rollup_aggregate",
    "merge_upsert",
    "pack_sequences",
    "table_profile",
    "corpus_curate",
    "corpus_mixture",
    "interval_coverage",
    "mixture_rebalance",
    # (c) r6 additions that landed after the r6 window froze at 50 —
    # never driver-sampled (funnel_analysis also carries the dtype fix).
    "burst_detection",
    "retention_cohorts",
    "funnel_analysis",
    "dwell_time_stats",
    "signif_calibration",
    "dup_triangles",
    "langid_eval",
    "char_ngram_profile",
    # (d) keys whose LATEST driver sample is the r5 NTZ-era error and
    # that sat outside the r6 window: value-verified in-repo since,
    # but the driver has no green row on the current testdata.
    "coloc",
    "study_locus_id",
    "trans_qtl_flag",
    "locus_statistics",
    "sumstat_qc_summary",
    "qc_pz_consistency",
    "qc_mean_beta",
    "sanity_filter",
    "qc_flag_accumulate",
    "qc_n_eff",
    "sumstat_harmonise_ingest",
    # rows-only kernels whose latest sample is also a stale error.
    "carma_finemap",
    "susie_like_finemap",
    "susie_inf_finemap",
    "susie_finemapper_step",
    "carma_shotgun_finemap",
    # (e) freshness rotation: oldest green evidence (r3) on
    # load-bearing queries, re-certified on the current testdata.
    "q1_pricing_summary",
    "overlap_join",
    "locus_breaker",
    "window_clump_leads",
    "sumstat_harmonise_full",
    "q_decile_stats",
    "top_k_per_group",
    "exclude_region",
    "harmonic_sum",
    "text_langid",
    "token_count",
    "doc_fingerprint",
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
