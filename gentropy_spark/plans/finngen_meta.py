"""FinnGen / UKBB / MVP meta-analysis manifest + study index (r8).

Reference: datasource/finngen_meta/__init__.py ``FinnGenMetaManifest``
and datasource/finngen_meta/study_index.py ``FinnGenMetaStudyIndex``
(the study-index half of the finngen_ukb_mvp_meta step; the
harmonisation half of that tree — filters, allele flipping, MAC/
imputation gates — is already mirrored by ``sumstat_harmonise_finngen``
in plans/stats_kernel.py:378).

The dialect exercises the MVP branch (the superset): per-cohort
case/control columns null-coalesced and summed into nSamples/nCases/
nControls, the four-ancestry discovery-samples cocktail with the
``sampleSize > 0`` filter, the ``{metaSource}_{fg_phenotype}`` study
id minting, the per-source publication constants, the LD-population
mapping with relative sample sizes (ppm ints for hash stability), and
the left-outer EFO curation join (the finngen/efo_mapping.py:75
contract: unmapped studies survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.sources.readers import read_table

REGISTRY: dict[str, QuerySpec] = {}

_META_SOURCE = "FINNGEN_R12_UKBB_MVP_META"
# Reference constants (finngen_meta/study_index.py:34): the
# FINNGEN_UKBB_MVP branch.
_META_SAMPLE_STR = (
    "1,550,147 (MVP: nEUR=449,042, nAFR=121,177, nAMR=59,048; "
    "FinnGenR12: nNFE=500,349; pan-UKBB-EUR: nEUR=420,531)"
)
_META_PUB_DATE = "2024-11-01"
_META_COHORTS = "MVP;FinnGen;pan-UKBB-EUR"
# Ancestry label → LD population (subset of the GWAS Catalog map that
# this cocktail can produce).
_META_ANC_2_LD = (
    ("Finnish", "fin"),
    ("European", "nfe"),
    ("African", "afr"),
    ("Admixed American", "amr"),
)
_FG_PHENOS = (
    "I9_HEARTFAIL",
    "J10_ASTHMA",
    "E4_DM2",
    "M13_RHEUMA",
    "K11_IBD",
    "F5_DEPRESSIO",
    "G6_MS",
)


def q_finngen_meta_study_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinnGen-UKBB-MVP meta-analysis manifest → study index.

    Mirrors ``FinnGenMetaManifest`` (finngen_meta/__init__.py):
    integer-cast per-cohort counts (:163), null-coalesced ``_add``
    totals (:200 — nSamples over ALL ancestry columns, nCases over
    the *_n_cases, nControls over *_n_controls), the MVP
    discovery-samples cocktail (:310 — FinnGen→Finnish,
    UKBB+MVP_EUR→European, MVP_AFR→African, MVP_AMR→Admixed American,
    zero-size entries filtered), study id
    ``{metaSource}_{fg_phenotype}`` (:404), and
    ``FinnGenMetaStudyIndex.from_finngen_manifest``
    (finngen_meta/study_index.py:46): publication constants per meta
    source, ``aggregate_and_map_ancestries`` LD structure, and the
    EFO-curation left join keyed on the phenotype name.
    """
    supp = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    sk = F.col("s_suppkey")
    pheno = F.element_at(
        F.array(*[F.lit(p) for p in _FG_PHENOS]), (sk % 7 + 1).cast("int")
    )
    # Raw manifest rows: some cohort columns null (the coalesce path),
    # MVP_AMR zero for % 5 rows (the sampleSize>0 filter path).
    manifest_raw = supp.select(
        pheno.alias("fg_phenotype"),
        F.concat(F.lit("phenotype name "), (sk % 7).cast("string")).alias(
            "name"
        ),
        F.when(sk % 11 != 0, (F.lit(500) + sk * 13 % 20_000))
        .cast("int")
        .alias("fg_n_cases"),
        (F.lit(100_000) + sk * 7 % 300_000).cast("int").alias("fg_n_controls"),
        (F.lit(400) + sk * 17 % 15_000).cast("int").alias("ukbb_n_cases"),
        F.when(sk % 13 != 0, F.lit(300_000) + sk * 3 % 100_000)
        .cast("int")
        .alias("ukbb_n_controls"),
        (F.lit(200) + sk * 23 % 8_000).cast("int").alias("mvp_afr_n_cases"),
        (F.lit(80_000) + sk * 29 % 40_000).cast("int").alias(
            "mvp_afr_n_controls"
        ),
        (F.lit(900) + sk * 31 % 30_000).cast("int").alias("mvp_eur_n_cases"),
        (F.lit(300_000) + sk * 37 % 140_000).cast("int").alias(
            "mvp_eur_n_controls"
        ),
        F.when(sk % 5 != 0, F.lit(100) + sk * 41 % 5_000)
        .cast("int")
        .alias("mvp_amr_n_cases"),
        F.when(sk % 5 != 0, F.lit(40_000) + sk * 43 % 18_000)
        .cast("int")
        .alias("mvp_amr_n_controls"),
        F.concat(
            F.lit("meta/sumstats/"), pheno, F.lit(".gz")
        ).alias("path_bucket"),
    ).distinct()

    def z(c: str) -> F.Column:
        return F.coalesce(F.col(c), F.lit(0))

    case_cols = [
        "fg_n_cases", "ukbb_n_cases", "mvp_afr_n_cases",
        "mvp_eur_n_cases", "mvp_amr_n_cases",
    ]
    control_cols = [
        "fg_n_controls", "ukbb_n_controls", "mvp_afr_n_controls",
        "mvp_eur_n_controls", "mvp_amr_n_controls",
    ]
    n_cases = sum((z(c) for c in case_cols), start=F.lit(0)).cast("int")
    n_controls = sum((z(c) for c in control_cols), start=F.lit(0)).cast("int")
    disc = F.filter(
        F.array(
            F.struct(
                (z("fg_n_cases") + z("fg_n_controls"))
                .cast("int")
                .alias("sample_size"),
                F.lit("Finnish").alias("ancestry"),
            ),
            F.struct(
                (
                    z("ukbb_n_cases")
                    + z("ukbb_n_controls")
                    + z("mvp_eur_n_cases")
                    + z("mvp_eur_n_controls")
                )
                .cast("int")
                .alias("sample_size"),
                F.lit("European").alias("ancestry"),
            ),
            F.struct(
                (z("mvp_afr_n_cases") + z("mvp_afr_n_controls"))
                .cast("int")
                .alias("sample_size"),
                F.lit("African").alias("ancestry"),
            ),
            F.struct(
                (z("mvp_amr_n_cases") + z("mvp_amr_n_controls"))
                .cast("int")
                .alias("sample_size"),
                F.lit("Admixed American").alias("ancestry"),
            ),
        ),
        lambda x: x.sample_size > 0,
    )
    ld_map = F.create_map(*[F.lit(x) for pair in _META_ANC_2_LD for x in pair])
    total = F.aggregate(
        disc, F.lit(0).cast("bigint"), lambda acc, x: acc + x.sample_size
    )
    ld_csv = F.array_join(
        F.array_sort(
            F.transform(
                disc,
                lambda x: F.concat_ws(
                    "=",
                    ld_map[x.ancestry],
                    F.round(x.sample_size / total * 1e6)
                    .cast("long")
                    .cast("string"),
                ),
            )
        ),
        ";",
    )
    manifest = manifest_raw.select(
        F.concat_ws("_", F.lit(_META_SOURCE), F.col("fg_phenotype")).alias(
            "study_id"
        ),
        F.lit(_META_SOURCE).alias("project_id"),
        F.lit("gwas").alias("study_type"),
        F.col("name").alias("trait_from_source"),
        F.lit(True).alias("has_sumstats"),
        F.col("path_bucket").alias("sumstats_location"),
        F.array_join(
            F.transform(
                disc,
                lambda x: F.concat_ws(
                    "=", x.ancestry, x.sample_size.cast("string")
                ),
            ),
            ";",
        ).alias("discovery_csv"),
        (n_cases + n_controls).cast("int").alias("n_samples"),
        n_cases.alias("n_cases"),
        n_controls.alias("n_controls"),
        ld_csv.alias("ld_pop_ppm_csv"),
        F.lit(_META_SAMPLE_STR).alias("initial_sample_size"),
        F.lit(_META_COHORTS).alias("cohorts_csv"),
        F.lit(_META_PUB_DATE).alias("publication_date"),
    )
    # EFO curation left join on the phenotype name (efo_mapping.py:75).
    nk = F.col("n_nationkey")
    efo = nat.select(
        F.concat(F.lit("phenotype name "), (nk % 7).cast("string")).alias(
            "trait_from_source"
        ),
        F.concat(
            F.lit("EFO_"), F.lpad((nk * 31 % 1_000_000).cast("string"), 7, "0")
        ).alias("efo_id"),
    ).filter(nk % 3 != 2)
    joined = manifest.join(F.broadcast(efo), on="trait_from_source", how="left")
    keep = [c for c in manifest.columns]
    return joined.groupBy(*keep).agg(
        F.array_join(F.array_sort(F.collect_list("efo_id")), ";").alias(
            "efo_ids_csv"
        ),
        F.count("efo_id").alias("n_efo"),
    )


def _finngen_meta_sql() -> str:
    phenos = "(['" + "','".join(_FG_PHENOS) + "'])"
    ld_cases = " ".join(
        f"WHEN '{a}' THEN '{p}'" for a, p in _META_ANC_2_LD
    )
    return f"""
WITH manifest_raw AS (
  SELECT DISTINCT
    {phenos}[CAST(s_suppkey % 7 AS INT) + 1] AS fg_phenotype,
    'phenotype name ' || CAST(s_suppkey % 7 AS VARCHAR) AS name,
    CASE WHEN s_suppkey % 11 <> 0
         THEN CAST(500 + s_suppkey * 13 % 20000 AS INT) END AS fg_n_cases,
    CAST(100000 + s_suppkey * 7 % 300000 AS INT) AS fg_n_controls,
    CAST(400 + s_suppkey * 17 % 15000 AS INT) AS ukbb_n_cases,
    CASE WHEN s_suppkey % 13 <> 0
         THEN CAST(300000 + s_suppkey * 3 % 100000 AS INT)
    END AS ukbb_n_controls,
    CAST(200 + s_suppkey * 23 % 8000 AS INT) AS mvp_afr_n_cases,
    CAST(80000 + s_suppkey * 29 % 40000 AS INT) AS mvp_afr_n_controls,
    CAST(900 + s_suppkey * 31 % 30000 AS INT) AS mvp_eur_n_cases,
    CAST(300000 + s_suppkey * 37 % 140000 AS INT) AS mvp_eur_n_controls,
    CASE WHEN s_suppkey % 5 <> 0
         THEN CAST(100 + s_suppkey * 41 % 5000 AS INT) END AS mvp_amr_n_cases,
    CASE WHEN s_suppkey % 5 <> 0
         THEN CAST(40000 + s_suppkey * 43 % 18000 AS INT)
    END AS mvp_amr_n_controls,
    'meta/sumstats/' || {phenos}[CAST(s_suppkey % 7 AS INT) + 1] || '.gz'
      AS path_bucket
  FROM supplier
),
cocktail AS (
  SELECT *,
    [struct_pack(sample_size := COALESCE(fg_n_cases, 0)
                   + COALESCE(fg_n_controls, 0),
                 ancestry := 'Finnish'),
     struct_pack(sample_size := COALESCE(ukbb_n_cases, 0)
                   + COALESCE(ukbb_n_controls, 0)
                   + COALESCE(mvp_eur_n_cases, 0)
                   + COALESCE(mvp_eur_n_controls, 0),
                 ancestry := 'European'),
     struct_pack(sample_size := COALESCE(mvp_afr_n_cases, 0)
                   + COALESCE(mvp_afr_n_controls, 0),
                 ancestry := 'African'),
     struct_pack(sample_size := COALESCE(mvp_amr_n_cases, 0)
                   + COALESCE(mvp_amr_n_controls, 0),
                 ancestry := 'Admixed American')
    ] AS disc_all
  FROM manifest_raw
),
with_disc AS (
  SELECT *,
    list_filter(disc_all, x -> x.sample_size > 0) AS disc,
    CAST(list_sum(list_transform(list_filter(disc_all,
         x -> x.sample_size > 0), x -> x.sample_size)) AS BIGINT) AS total
  FROM cocktail
),
manifest AS (
  SELECT
    '{_META_SOURCE}_' || fg_phenotype AS study_id,
    '{_META_SOURCE}' AS project_id,
    'gwas' AS study_type,
    name AS trait_from_source,
    TRUE AS has_sumstats,
    path_bucket AS sumstats_location,
    array_to_string(list_transform(disc,
      x -> x.ancestry || '=' || CAST(x.sample_size AS VARCHAR)), ';')
      AS discovery_csv,
    CAST(COALESCE(fg_n_cases,0) + COALESCE(ukbb_n_cases,0)
       + COALESCE(mvp_afr_n_cases,0) + COALESCE(mvp_eur_n_cases,0)
       + COALESCE(mvp_amr_n_cases,0)
       + COALESCE(fg_n_controls,0) + COALESCE(ukbb_n_controls,0)
       + COALESCE(mvp_afr_n_controls,0) + COALESCE(mvp_eur_n_controls,0)
       + COALESCE(mvp_amr_n_controls,0) AS INT) AS n_samples,
    CAST(COALESCE(fg_n_cases,0) + COALESCE(ukbb_n_cases,0)
       + COALESCE(mvp_afr_n_cases,0) + COALESCE(mvp_eur_n_cases,0)
       + COALESCE(mvp_amr_n_cases,0) AS INT) AS n_cases,
    CAST(COALESCE(fg_n_controls,0) + COALESCE(ukbb_n_controls,0)
       + COALESCE(mvp_afr_n_controls,0) + COALESCE(mvp_eur_n_controls,0)
       + COALESCE(mvp_amr_n_controls,0) AS INT) AS n_controls,
    array_to_string(list_sort(list_transform(disc,
      x -> (CASE x.ancestry {ld_cases} END) || '='
           || CAST(CAST(ROUND(x.sample_size / total * 1000000.0, 0)
                        AS BIGINT) AS VARCHAR))), ';') AS ld_pop_ppm_csv,
    '{_META_SAMPLE_STR}' AS initial_sample_size,
    '{_META_COHORTS}' AS cohorts_csv,
    '{_META_PUB_DATE}' AS publication_date
  FROM with_disc
),
efo AS (
  SELECT 'phenotype name ' || CAST(n_nationkey % 7 AS VARCHAR)
           AS trait_from_source,
         'EFO_' || lpad(CAST(n_nationkey * 31 % 1000000 AS VARCHAR), 7, '0')
           AS efo_id
  FROM nation WHERE n_nationkey % 3 <> 2
)
SELECT m.*,
       COALESCE(array_to_string(list_sort(list(e.efo_id)
                  FILTER (e.efo_id IS NOT NULL)), ';'), '') AS efo_ids_csv,
       COUNT(e.efo_id) AS n_efo
FROM manifest m
LEFT JOIN efo e USING (trait_from_source)
GROUP BY ALL
"""


REGISTRY["finngen_meta_study_ingest"] = QuerySpec(
    q_finngen_meta_study_ingest, _finngen_meta_sql()
)
