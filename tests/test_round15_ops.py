"""Round-15 additions: locus_statistics_boundaries (C12, reference
study_locus.py:1342) and locus_study_type / annotate_study_type (C13,
reference study_locus.py:233 + study_index.py:226).

Value-exactness is the driver oracle gate (both keys verified at
sf0.001/0.01/0.1 when added); these pin the semantic invariants the
hash gate can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_boundaries_superset_of_cluster_members(spark):
    """Boundary-bounded tags are a SUPERSET of the cluster's own
    members: the flanked [locus_start, locus_end] window contains every
    baseline-significant point that formed the locus, plus any
    sub-significant tags in the flanks — so n_tags >= n_members, with
    the lead position always inside the bounds."""
    from gentropy_spark.plans.genomics import (
        q_locus_breaker,
        q_locus_statistics_boundaries,
    )

    loci = {
        (r.study_id, r.contig, r.cluster_seq): r
        for r in q_locus_breaker(spark, SF).collect()
    }
    rows = q_locus_statistics_boundaries(spark, SF).collect()
    assert rows and len(rows) == len(loci)
    for r in rows:
        base = loci[(r.study_id, r.contig, r.cluster_seq)]
        assert r.n_tags >= base.n_members
        assert 0 < r.n_unique_positions <= r.n_tags
        assert r.locus_start <= r.lead_pos <= r.locus_end
        assert r.tag_signal_mass > 0.0


def test_boundaries_counts_all_points_in_window(spark):
    """Spot-check one locus against a brute-force recount of the raw
    sumstats inside its boundaries (no significance filter)."""
    from gentropy_spark.plans.genomics import (
        q_locus_statistics_boundaries,
        sumstats,
    )

    r = q_locus_statistics_boundaries(spark, SF).orderBy(
        F.col("n_tags").desc(), "study_id", "contig", "cluster_seq"
    ).first()
    brute = (
        sumstats(spark, SF)
        .filter(
            (F.col("study_id") == r.study_id)
            & (F.col("contig") == r.contig)
            & (F.col("pos") >= r.locus_start)
            & (F.col("pos") <= r.locus_end)
        )
        .count()
    )
    assert r.n_tags == brute


def test_annotate_study_type_operator_semantics(spark):
    """Reference contract (study_locus.py:233): LEFT join — loci with
    unknown studies keep NULL type, nothing is filtered — and a stale
    study_type column on the locus side is replaced, not duplicated."""
    from gentropy_spark.operators.coloc import annotate_study_type

    loci = spark.createDataFrame(
        [(1, 10, "stale"), (2, 20, "stale"), (3, 30, None)],
        "study_id int, locus_id int, study_type string",
    )
    idx = spark.createDataFrame(
        [(1, "gwas"), (3, "eqtl")], "study_id int, study_type string"
    )
    out = annotate_study_type(loci, idx)
    assert out.columns.count("study_type") == 1
    got = {r.locus_id: r.study_type for r in out.collect()}
    assert got == {10: "gwas", 20: None, 30: "eqtl"}


def test_locus_study_type_never_filters(spark):
    """Annotation preserves the locus table's cardinality (the LUT is
    unique per study, the join is LEFT) and every non-null type comes
    from the 5-value segment mapping."""
    from gentropy_spark.plans.genomics import (
        _SEGMENT_STUDY_TYPE,
        q_locus_study_type,
        q_window_clump_leads,
    )

    rows = q_locus_study_type(spark, SF).collect()
    assert len(rows) == q_window_clump_leads(spark, SF).count()
    types = {r.study_type for r in rows}
    assert types - {None} <= set(_SEGMENT_STUDY_TYPE.values())
