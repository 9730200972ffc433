"""Unit tests for the r8 study-index assembly dialects (plans/studies.py).

Semantics fixtures are lifted from the reference's own doctest /
test examples:
- tests/gentropy/datasource/gwas_catalog/test_gwas_catalog_study_splitter.py
  (the GCST003436 split / no-split pair),
- datasource/gwas_catalog/study_index.py:52 doctest
  (the even-split: ("European, African, Asian", 100) plus a separate
  ("European", 50) row yields European 50 + 100//3 = 83,
  African/Asian 33 each),
- study_index.py:216 parse_cohorts doctest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def test_splitter_resolve_study_id_reference_fixture(spark):
    """Reference fixture: same description → no split; different → _N."""
    from pyspark.sql import Window

    same = spark.createDataFrame(
        [
            ("varA", "GCST003436", "Endometrial cancer|no_pvalue_text|EFO_1001512"),
            ("varB", "GCST003436", "Endometrial cancer|no_pvalue_text|EFO_1001512"),
        ],
        ["variant_id", "study_id", "sub_study_description"],
    )
    diff = spark.createDataFrame(
        [
            ("varA", "GCST003436", "Endometrial cancer|no_pvalue_text|EFO_1001512"),
            ("varB", "GCST003436", "Uterine carcinoma|no_pvalue_text|EFO_0002919"),
        ],
        ["variant_id", "study_id", "sub_study_description"],
    )

    def resolve(df):
        w_split = Window.partitionBy("study_id").orderBy("sub_study_description")
        w_study = Window.partitionBy("study_id")
        ranked = df.withColumn("sub_rank", F.dense_rank().over(w_split)).withColumn(
            "n_substudies", F.max("sub_rank").over(w_study)
        )
        return ranked.select(
            "variant_id",
            F.when(F.col("n_substudies") == 1, F.col("study_id"))
            .otherwise(
                F.concat_ws("_", F.col("study_id"), F.col("sub_rank").cast("string"))
            )
            .alias("updated_study_id"),
        )

    got_same = {r.updated_study_id for r in resolve(same).collect()}
    assert got_same == {"GCST003436"}
    got_diff = {
        (r.variant_id, r.updated_study_id) for r in resolve(diff).collect()
    }
    assert got_diff == {("varA", "GCST003436_1"), ("varB", "GCST003436_2")}


def test_discovery_sample_even_split_reference_doctest(spark):
    """study_index.py:52 doctest: ('European, African, Asian', 100) +
    ('European', 50) → European 83, African 33, Asian 33."""
    from gentropy_spark.plans.studies import _ANC_SPLIT_RE

    pairs = spark.createDataFrame(
        [
            ("s2", "initial", "European, African, Asian", 100),
            ("s2", "initial", "European", 50),
        ],
        ["study_id", "stage", "ancestry_label", "n_individuals"],
    ).distinct()
    label_parts = F.split(F.col("ancestry_label"), _ANC_SPLIT_RE)
    out = (
        pairs.select(
            "study_id",
            F.explode(label_parts).alias("ancestry"),
            (F.col("n_individuals") / F.size(label_parts))
            .cast("long")
            .alias("part_count"),
        )
        .groupBy("study_id", "ancestry")
        .agg(F.sum("part_count").alias("n"))
    )
    got = {(r.ancestry, r.n) for r in out.collect()}
    assert got == {("European", 83), ("African", 33), ("Asian", 33)}


def test_ancestry_split_keeps_parenthesized_comma(spark):
    """The GME label's in-parens comma must survive the split regex."""
    from gentropy_spark.plans.studies import _ANC_SPLIT_RE

    label = (
        "European, Greater Middle Eastern (Middle Eastern, North African or"
        " Persian), African"
    )
    df = spark.createDataFrame([(label,)], ["x"]).select(
        F.split(F.col("x"), _ANC_SPLIT_RE).alias("parts")
    )
    parts = df.collect()[0].parts
    assert parts == [
        "European",
        "Greater Middle Eastern (Middle Eastern, North African or Persian)",
        "African",
    ]


def test_gwas_study_ingest_shapes(spark):
    from gentropy_spark.plans.studies import q_gwas_study_ingest

    out = q_gwas_study_ingest(spark, SF)
    rows = out.collect()
    assert len(rows) == 1500
    by_id = {r.study_id: r for r in rows}
    # Accession fallback for the % 97 == 0 keys.
    assert any(k.startswith("NOID_") for k in by_id)
    # Trait fallback.
    assert any(r.trait == "Unreported" for r in rows)
    # cases+controls arithmetic: study 4 is the "12,345-style" branch.
    r4 = by_id["GCST00000004"]
    assert r4.n_samples == r4.n_cases + r4.n_controls and r4.n_cases > 10_000
    # NULL initial_sample_size → NULL n_samples but zero cases.
    r41 = by_id["GCST00000041"]
    assert r41.n_samples is None and r41.n_cases == 0
    # ld ppm entries sum to ~1e6 per study when present.
    for r in rows[:50]:
        if r.ld_pop_ppm_csv:
            total = sum(
                int(e.split("=")[1]) for e in r.ld_pop_ppm_csv.split(";")
            )
            assert abs(total - 1_000_000) <= len(r.ld_pop_ppm_csv.split(";"))


def test_gwas_study_split_flags(spark):
    from gentropy_spark.plans.studies import q_gwas_study_split

    out = q_gwas_study_split(spark, SF)
    rows = out.collect()
    assert all("top_hit" in r.qc_csv for r in rows)
    # Multi-substudy study ids get the _N suffix; suffix is within range.
    for r in rows:
        if r.n_substudies > 1:
            assert r.updated_study_id.startswith(r.study_id + "_")
            assert 1 <= int(r.updated_study_id.rsplit("_", 1)[1]) <= r.n_substudies
    # pvalue_text decoration present for 'males'/'EA' rows.
    assert any("[males]" in r.trait_resolved for r in rows)


def test_gwas_study_curation_flags(spark):
    from gentropy_spark.plans.studies import q_gwas_study_curation

    out = q_gwas_study_curation(spark, SF)
    rows = out.collect()
    for r in rows:
        if not r.is_curated:
            assert "Study not curated by Open Targets" in r.quality_controls_csv
        else:
            assert "Study not curated" not in r.quality_controls_csv
    # Curated type override happens for some studies.
    assert any(r.study_type != "gwas" for r in rows)


def test_gwas_catalog_step_pipeline_dag(tmp_path, spark):
    """The reference's GWASCatalogTopHitIngestionStep /
    study-curation step as a configured DAG: study index → splitter →
    top hits, curation parallel — smoke: runs topologically, writes
    parquet per step (gwas_catalog_top_hits.py:18,
    gwas_catalog_study_curation step shape)."""
    import json

    from gentropy_spark.cli import run_dag

    cfg = {
        "sf_dir": SF,
        "out_dir": str(tmp_path / "out"),
        "steps": {
            "study_index": {"query": "gwas_study_ingest"},
            "split": {"query": "gwas_study_split", "after": ["study_index"]},
            "top_hits": {"query": "gwas_top_hits", "after": ["split"]},
            "curation": {"query": "gwas_study_curation", "after": ["study_index"]},
        },
    }
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps(cfg))
    order = run_dag(str(p))
    assert order == ["study_index", "curation", "split", "top_hits"]
    top = spark.read.parquet(str(tmp_path / "out" / "top_hits"))
    assert top.count() > 0
    assert "lead_variant_id" in top.columns


def test_finngen_meta_discovery_cocktail(spark):
    """MVP cocktail: zero-size ancestries filtered; totals include all
    cohort columns null-coalesced (finngen_meta/__init__.py:200,310)."""
    from gentropy_spark.plans.finngen_meta import q_finngen_meta_study_ingest

    rows = q_finngen_meta_study_ingest(spark, SF).collect()
    assert rows
    for r in rows:
        entries = dict(
            e.split("=") for e in r.discovery_csv.split(";")
        )
        assert all(int(v) > 0 for v in entries.values())
        assert sum(int(v) for v in entries.values()) == r.n_samples
        assert r.n_samples == r.n_cases + r.n_controls
        assert r.study_id.startswith("FINNGEN_R12_UKBB_MVP_META_")


def test_finngen_sumstat_na_positions_dropped(spark):
    from gentropy_spark.plans.sumstat_ingest import q_finngen_sumstat_ingest

    rows = q_finngen_sumstat_ingest(spark, SF).collect()
    assert rows
    assert all(r.position is not None and r.beta != 0 for r in rows)
    assert all(r.study_id.startswith("FINNGEN_R12_") for r in rows)


def test_gwas_sumstat_both_formats(spark):
    """Legacy rows derive beta from ln(OR) and SE from the CI spread."""
    import math

    from gentropy_spark.plans.sumstat_ingest import q_gwas_sumstat_ingest

    rows = q_gwas_sumstat_ingest(spark, SF).collect()
    assert rows
    # ln(1.2/0.8)/3.92 is constant for every legacy row by construction.
    legacy_se = round(abs(math.log(1.2 / 0.8)) / 3.92, 6)
    assert any(r.standard_error == pytest.approx(legacy_se) for r in rows)
    assert all(r.beta is not None and r.beta != 0 for r in rows)


def test_ukb_ppp_study_peek_join(spark):
    from gentropy_spark.plans.sumstat_ingest import q_ukb_ppp_study_ingest

    rows = q_ukb_ppp_study_ingest(spark, SF).collect()
    assert rows
    # Inner join: only studies present in the chr22 sumstats slice.
    assert all(r.n_samples >= 30_000 for r in rows)
    assert all(r.ld_pop_ppm_csv == "nfe=1000000" for r in rows)


def test_ot_variant_vcf_gate(spark):
    from gentropy_spark.plans.sumstat_ingest import q_ot_variant_to_vcf

    rows = q_ot_variant_to_vcf(spark, SF).collect()
    assert rows
    for r in rows:
        assert all(ch in "GCTA." for ch in r.ref)
        assert all(ch in "GCTA." for ch in r.alt)
        assert r.pos is not None and r.chrom != "."
        assert r.qual == "." and r.filter == "." and r.info == "."
    # rsIDs surface in the ID column where present.
    assert any(r.id.startswith("rs") for r in rows)


def test_bpe_pair_counts_ranked(spark):
    """Top pair is the global BPE merge candidate; weighted by word
    frequency (Sennrich et al. 2016 semantics)."""
    from gentropy_spark.plans.llm_pipeline import (
        BPE_TOP_PAIRS,
        q_bpe_pair_counts,
    )

    rows = q_bpe_pair_counts(spark, SF).collect()
    assert len(rows) == BPE_TOP_PAIRS
    assert all(len(r.pair) == 2 for r in rows)
    counts = [r.pair_count for r in sorted(rows, key=lambda r: r.rank)]
    assert counts == sorted(counts, reverse=True)


def test_dsir_importance_target_shift(spark):
    """Target-like docs must receive higher mean importance than the
    rest of the corpus (the DSIR selection property)."""
    from gentropy_spark.plans.llm_pipeline import q_dsir_importance

    rows = q_dsir_importance(spark, SF).collect()
    assert rows
    tgt = [r.log_importance / r.n_feat for r in rows if r.doc_id % 10 == 0]
    raw = [r.log_importance / r.n_feat for r in rows if r.doc_id % 10 != 0]
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)


def test_drug_enrichment_contingency_consistency(spark):
    """Cells must be internally consistent and monotone in phase:
    higher phase thresholds can only shrink the high-phase cells."""
    from gentropy_spark.plans.l2g import q_drug_enrichment

    rows = {r.clinical_phase: r for r in q_drug_enrichment(spark, SF).collect()}
    assert set(rows) == {"2+", "3+", "4+"}
    n_g = {p: r.yes_evid_low_phase + r.yes_evid_high_phase for p, r in rows.items()}
    n_negg = {p: r.no_evid_low_phase + r.no_evid_high_phase for p, r in rows.items()}
    # Margins are phase-independent.
    assert len(set(n_g.values())) == 1 and len(set(n_negg.values())) == 1
    # High-phase cells shrink as the threshold rises.
    assert rows["2+"].yes_evid_high_phase >= rows["3+"].yes_evid_high_phase
    assert rows["3+"].yes_evid_high_phase >= rows["4+"].yes_evid_high_phase
    for r in rows.values():
        assert r.ci_low <= r.odds_ratio <= r.ci_high
        assert r.ci_rs_low <= r.relative_success <= r.ci_rs_high
        assert 0.0 <= r.rs_p_value <= 1.0
