"""Façade API test: a reference-style pipeline ports line by line."""

from __future__ import annotations

from pyspark.sql import functions as F

from gentropy_spark.api import Colocalisation, StudyLocus, SummaryStatistics
from gentropy_spark.plans.genomics import sumstats


def test_reference_style_pipeline(spark, sf_dir):
    ss = SummaryStatistics(sumstats(spark, sf_dir))

    cleaned = ss.sanity_filter().pvalue_filter(50.0)
    assert cleaned.df.count() > 0

    loci = cleaned.locus_breaker_clumping(
        baseline_signif=50.0,
        distance_cutoff=43_200_000_000,
        lead_signif=150.0,
        flank=3_600_000_000,
    ).assign_study_locus_id(["study_id", "contig", "cluster_seq"])
    assert "study_locus_id" in loci.df.columns

    left = StudyLocus(loci.df.filter(F.col("study_id") % 2 == 0))
    right = StudyLocus(loci.df.filter(F.col("study_id") % 2 == 1))
    pairs = left.find_overlaps(right)
    plain = pairs.count()
    tiled = left.find_overlaps(right, tile_width=86_400_000_000).count()
    assert plain == tiled  # scale path emits identical pairs

    clumped = cleaned.window_based_clumping(distance=21_600_000_000)
    assert clumped.df.filter(F.col("n_members") < 1).count() == 0

    # coloc over synthetic tag overlaps built from the same frame
    from gentropy_spark.plans.genomics import _tag_overlaps

    res = Colocalisation.coloc(_tag_overlaps(spark, sf_dir))
    row = res.select(
        (F.col("h0") + F.col("h1") + F.col("h2") + F.col("h3") + F.col("h4")).alias(
            "total"
        )
    ).first()
    assert abs(row.total - 1.0) < 1e-9  # posteriors sum to 1


def test_corpus_facade_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from gentropy_spark.api import Corpus
    from gentropy_spark.sources.readers import read_table

    corpus = Corpus(read_table(spark, sf_dir, "documents"))
    n_docs = corpus.df.count()
    canon = corpus.canonical_only()
    assert 0 < canon.df.count() <= n_docs
    sampled = canon.sample_stratified({"en": "8000"}, default="ffff")
    assert 0 < sampled.df.count() <= canon.df.count()
    packed = sampled.pack_sequences(budget_tokens=256)
    assert packed.filter(F.col("bin_id") < 0).count() == 0
    red = corpus.pii_redact()
    assert red.count() == n_docs
