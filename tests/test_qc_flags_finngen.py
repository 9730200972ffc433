"""Tests for the StudyLocus QC flag parity sweep and the FinnGen-shaped
multi-cohort harmonisation dialect (r4).

Mirrors the reference surfaces: dataset/study_locus.py:62
``StudyLocusQualityCheck`` (all 23 flags emitted, accumulate-never-
drop) and datasource/finngen_meta/summary_statistics.py:302
``from_source`` (meta-analyzed / imputation / MAC filters, direction
alignment, combined EAF).
"""

from __future__ import annotations

import pyspark.sql.functions as F

# The reference enum, verbatim (dataset/study_locus.py:62).
REFERENCE_FLAGS = {
    "SUBSIGNIFICANT_FLAG",
    "NO_GENOMIC_LOCATION_FLAG",
    "COMPOSITE_FLAG",
    "INCONSISTENCY_FLAG",
    "NON_MAPPED_VARIANT_FLAG",
    "PALINDROMIC_ALLELE_FLAG",
    "AMBIGUOUS_STUDY",
    "UNRESOLVED_LD",
    "LD_CLUMPED",
    "WINDOW_CLUMPED",
    "NO_POPULATION",
    "FLAGGED_STUDY",
    "MISSING_STUDY",
    "DUPLICATED_STUDYLOCUS_ID",
    "INVALID_VARIANT_IDENTIFIER",
    "TOP_HIT",
    "IN_MHC",
    "REDUNDANT_PICS_TOP_HIT",
    "EXPLAINED_BY_SUSIE",
    "ABNORMAL_PIPS",
    "OUT_OF_SAMPLE_LD",
    "INVALID_CHROMOSOME",
    "TOP_HIT_AND_SUMMARY_STATS",
}


def test_flag_surface_covers_reference_enum(spark, sf_dir):
    """Every reference StudyLocusQualityCheck member is emitted by the
    sweep (flag-name parity, the r3 verdict's 'parity table' ask)."""
    # r9: the sweep is built from one Spark-SQL string (the plan-shape
    # + py4j-latency rewrite) — assert against the GENERATED SQL, which
    # is what actually executes.
    from gentropy_spark.plans.variants import _study_locus_qc_spark_sql

    sql = _study_locus_qc_spark_sql(32)
    missing = {f for f in REFERENCE_FLAGS if f"'{f}'" not in sql}
    assert not missing, f"flags absent from the sweep: {missing}"


def test_flag_sweep_invariants(spark, sf_dir):
    from gentropy_spark.plans.variants import q_study_locus_qc_flags

    rows = q_study_locus_qc_flags(spark, sf_dir).collect()
    assert rows
    for r in rows:
        flags = [f for f in r.qc_flags.split(";") if f]
        # accumulate-never-drop: count column matches the string
        assert r.n_flags == len(flags)
        assert r.is_clean == (len(flags) == 0)
        # every emitted name is a reference enum member
        assert set(flags) <= REFERENCE_FLAGS
        # layering: window-clumped rows are never leads, and only
        # leads can be LD-clumped (reference clump ordering)
        if "WINDOW_CLUMPED" in flags:
            assert not r.is_lead
        if "LD_CLUMPED" in flags:
            assert r.is_lead
        # redundant-top-hit implies top-hit
        if "REDUNDANT_PICS_TOP_HIT" in flags:
            assert "TOP_HIT" in flags


def test_finngen_harmonise_filters_and_alignment(spark, sf_dir):
    from gentropy_spark.plans.stats_kernel import (
        FINNGEN_COHORTS,
        FINNGEN_MIN_ALLELE_COUNT,
        q_sumstat_harmonise_finngen,
    )

    df = q_sumstat_harmonise_finngen(spark, sf_dir)
    rows = df.collect()
    assert rows
    n_by_name = {name: n for name, n, _ in FINNGEN_COHORTS}
    mods = {name: mod for name, _, mod in FINNGEN_COHORTS}
    for r in rows:
        # (4) meta-analyzed only
        assert r.n_cohorts >= 2
        # sample size is the sum over present cohorts
        present = [name for name, mod in mods.items() if r.point_id % mod != 0]
        assert r.sample_size == sum(n_by_name[p] for p in present)
        assert len(present) == r.n_cohorts
        # (7) direction flip: flipped rows carry the swapped variant id
        ref_alt = r.variant_id.split("_")[2:]
        if r.point_id % 10 == 7:
            # alt comes first in the aligned id
            pass  # structural; exact alleles checked in the oracle gate
        # combined EAF is a frequency
        assert 0.0 <= r.eaf <= 1.0
        # (10) MAC holds in every present cohort — recompute from the
        # generator (af flipped when direction = -1)
        for i, (name, n, mod) in enumerate(FINNGEN_COHORTS, start=1):
            if r.point_id % mod == 0:
                continue
            af = ((r.point_id * 37 + i) % 1000) / 1000.0
            if r.point_id % 10 == 7:
                af = 1.0 - af
            assert 2.0 * min(af, 1.0 - af) * n >= FINNGEN_MIN_ALLELE_COUNT


def test_finngen_imputation_filter(spark, sf_dir):
    """No surviving row has a present MVP cohort with low r2."""
    from gentropy_spark.plans.stats_kernel import (
        FINNGEN_IMPUTATION_MIN_R2,
        q_sumstat_harmonise_finngen,
    )

    rows = q_sumstat_harmonise_finngen(spark, sf_dir).collect()
    for r in rows:
        if r.point_id % 4 != 0:  # mvp present
            r2 = 0.75 + ((r.point_id * 13) % 100) / 400.0
            assert r2 >= FINNGEN_IMPUTATION_MIN_R2
