"""Remaining raw summary-stats / variant ingestion dialects (r8).

Closes the last uncited reference datasource files that are
query-shaped (everything else left is the ensembl REST client):

- ``finngen_sumstat_ingest`` — FinnGen raw release sumstats
  (datasource/finngen/summary_stats.py): string-schema parse with the
  ``#chrom`` header quirk, non-numeric-position drop via int-cast
  null, upper-cased filename study ids, p-value split, beta≠0.
- ``gwas_sumstat_ingest`` — GWAS Catalog harmonised sumstats
  (datasource/gwas_catalog/summary_statistics.py): BOTH harmoniser
  generations in one run — the new ``hm_``-prefixed format with
  p_value, and the legacy format with neg_log_10_p_value + odds
  ratio/CI instead of beta/SE — column-presence dispatch, the
  mantissa/exponent fallback chain, and the β/OR/CI coalesce cascade.
- ``ukb_ppp_study_ingest`` — UKB-PPP (EUR) pQTL study index
  (datasource/ukb_ppp_eur/study_index.py): the sumstats "peek" for
  nSamples (chr22 slice → per-study aggregate), metadata TSV parse,
  inner join, single-ancestry EUR discovery/LD structure.
- ``ot_variant_to_vcf`` — OT variant export to VCF
  (datasource/open_targets/variants.py ``as_vcf_df``): variantId ∪
  locus.variantId explode, underscore-split VCF columns with '.'
  coalesces, ACGT-regex allele gate, ordered distinct. (The rsID →
  coordinates half needs the Ensembl REST API — out of scope for a
  query engine, noted not mirrored.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.sources.readers import read_table

REGISTRY: dict[str, QuerySpec] = {}

_BASES = ("A", "C", "G", "T")


# --- FinnGen raw release summary statistics --------------------------------
def q_finngen_sumstat_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinnGen raw sumstats parse (finngen/summary_stats.py:38).

    The raw TSV ships every column as STRING (raw_schema :20): the
    position filter is an int-CAST null check (non-numeric 'NA' rows
    drop, :57), the study id is the upper-cased filename stem
    (:62 — the regexp handles .tsv.gz/.gz/.tsv), the variant id is the
    ``#chrom``-prefixed concat, p-values split to mantissa/exponent,
    and zero-beta rows drop (:85). The reference then
    repartitionByRange(30, chromosome, position) — partitioning
    advice, not semantics; the writer handles that here.
    """
    from gentropy_spark.functions.stats import split_pvalue

    ev = read_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    bases = F.array(*[F.lit(b) for b in _BASES])
    fname = F.concat(
        F.lit("finngen_R12_"),
        F.lit("ab1_pheno"),
        (eid % 40).cast("string"),
        F.lit(".tsv.gz"),
    )
    raw = ev.select(
        F.concat(F.lit("release/sumstats/"), fname).alias("file_path"),
        ((eid % 22) + 1).cast("string").alias("#chrom"),
        F.when(eid % 37 == 0, F.lit("NA"))
        .otherwise(((eid * 89) % 4_000_000).cast("string"))
        .alias("pos"),
        F.element_at(bases, (eid % 4 + 1).cast("int")).alias("ref"),
        F.element_at(bases, ((eid + 2) % 4 + 1).cast("int")).alias("alt"),
        (((eid * 41) % 9999 + 1) / 10_000.0).cast("string").alias("pval"),
        F.when(eid % 19 == 0, F.lit("0.0"))
        .otherwise((((eid % 1001) - 500) / 250.0).cast("string"))
        .alias("beta"),
        ((eid % 499 + 1) / 1000.0).cast("string").alias("sebeta"),
        ((eid % 997 + 1) / 1000.0).cast("string").alias("af_alt"),
    )
    m, e = split_pvalue(F.col("pval").cast("double"))
    return (
        # try_cast: the reference relies on legacy-mode cast-to-null for
        # 'NA' positions; ANSI-mode Spark 4 throws on plain cast.
        raw.filter(F.col("pos").try_cast("int").isNotNull())
        .select(
            F.upper(
                F.regexp_extract(
                    # Non-greedy + anchored: the reference's greedy
                    # pattern (finngen/summary_stats.py:64) leaves
                    # '.tsv' inside the stem for *.tsv.gz files (its
                    # real inputs are plain .gz, so the defect is
                    # latent there); the stem here must match the
                    # study-index phenocode ids.
                    F.col("file_path"), r"([^/]+?)(\.tsv\.gz|\.gz|\.tsv)$", 1
                )
            ).alias("study_id"),
            F.concat_ws(
                "_", F.col("#chrom"), F.col("pos"), F.col("ref"), F.col("alt")
            ).alias("variant_id"),
            F.col("#chrom").alias("chromosome"),
            F.col("pos").try_cast("int").alias("position"),
            m,
            e,
            F.col("beta").cast("double").alias("beta"),
            F.col("sebeta").cast("double").alias("standard_error"),
            F.col("af_alt").cast("double").alias("eaf_from_source"),
        )
        .filter(F.col("beta") != 0)
    )


FINNGEN_SUMSTAT_SQL = """
WITH raw AS (
  SELECT 'release/sumstats/finngen_R12_ab1_pheno'
           || CAST(event_id % 40 AS VARCHAR) || '.tsv.gz' AS file_path,
         CAST((event_id % 22) + 1 AS VARCHAR) AS chrom,
         CASE WHEN event_id % 37 = 0 THEN 'NA'
              ELSE CAST((event_id * 89) % 4000000 AS VARCHAR) END AS pos,
         (['A','C','G','T'])[CAST(event_id % 4 AS INT) + 1] AS ref,
         (['A','C','G','T'])[CAST((event_id + 2) % 4 AS INT) + 1] AS alt,
         CAST(((event_id * 41) % 9999 + 1) / 10000.0 AS VARCHAR) AS pval,
         CASE WHEN event_id % 19 = 0 THEN '0.0'
              ELSE CAST(((event_id % 1001) - 500) / 250.0 AS VARCHAR)
         END AS beta,
         CAST((event_id % 499 + 1) / 1000.0 AS VARCHAR) AS sebeta,
         CAST((event_id % 997 + 1) / 1000.0 AS VARCHAR) AS af_alt
  FROM events
)
SELECT upper(regexp_extract(file_path,
         '([^/]+?)(\\.tsv\\.gz|\\.gz|\\.tsv)$', 1)) AS study_id,
       chrom || '_' || pos || '_' || ref || '_' || alt AS variant_id,
       chrom AS chromosome,
       CAST(pos AS INT) AS position,
       ROUND(CAST(pval AS DOUBLE)
             / POW(10.0, FLOOR(LOG10(CAST(pval AS DOUBLE)))), 3)
         AS p_mantissa,
       CAST(FLOOR(LOG10(CAST(pval AS DOUBLE))) AS INT) AS p_exponent,
       CAST(beta AS DOUBLE) AS beta,
       CAST(sebeta AS DOUBLE) AS standard_error,
       CAST(af_alt AS DOUBLE) AS eaf_from_source
FROM raw
WHERE TRY_CAST(pos AS INT) IS NOT NULL AND CAST(beta AS DOUBLE) <> 0
"""


REGISTRY["finngen_sumstat_ingest"] = QuerySpec(
    q_finngen_sumstat_ingest, FINNGEN_SUMSTAT_SQL
)


# --- GWAS Catalog harmonised summary statistics ----------------------------
def q_gwas_sumstat_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GWAS Catalog harmonised sumstats, BOTH harmoniser generations.

    Reference: gwas_catalog/summary_statistics.py:61
    ``from_gwas_harmonized_summary_stats`` — the column-presence
    dispatch (hm_chrom vs chromosome, :88; p_value vs
    neg_log_10_p_value, :108; hm_beta/beta absent → odds ratio /
    hazard ratio + CI, :126) collapses per-file to one of two shapes;
    both are exercised here as one run over a format-split source
    (even event ids = the NEW hm_ format with p_value + beta + SE;
    odd = the LEGACY format with neg-log p + odds ratio + CI), each
    branch flowing through split_pvalue / pvalue_from_neglog and the
    β/OR/CI coalesce cascade (common/stats normalise_gwas_statistics
    — functions/stats.py harmonise_effect), then the shared
    position/beta-nonnull/nonzero gates (:197).
    """
    from gentropy_spark.functions.stats import (
        harmonise_effect,
        pvalue_from_neglog,
        split_pvalue,
    )

    ev = read_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    bases = F.array(*[F.lit(b) for b in _BASES])
    is_new = eid % 2 == 0
    accession = F.concat(
        F.lit("GCST"), F.lpad((eid % 150).cast("string"), 8, "0")
    )
    chrom = ((eid % 22) + 1).cast("string")
    position = F.when(eid % 43 != 0, (eid * 97) % 4_000_000)
    pval = ((eid * 43) % 9999 + 1) / 10_000.0
    neglog = F.round((eid % 3000) / 100.0 + 0.1, 6)
    beta_new = F.when(eid % 17 == 0, F.lit(0.0)).otherwise(
        ((eid % 2001) - 1000) / 400.0
    )
    odds = 0.5 + (eid % 400) / 100.0
    ci_up = odds * 1.2
    ci_lo = odds * 0.8
    raw = ev.select(
        eid.alias("event_id"),
        accession.alias("study_id"),
        chrom.alias("chromosome"),
        position.alias("position"),
        F.element_at(bases, (eid % 4 + 1).cast("int")).alias("ref"),
        F.element_at(bases, ((eid + 3) % 4 + 1).cast("int")).alias("alt"),
        is_new.alias("is_new_format"),
        F.when(is_new, pval).alias("p_value"),
        F.when(~is_new, neglog).alias("neg_log_10_p_value"),
        F.when(is_new, beta_new).alias("hm_beta"),
        F.when(~is_new, odds).alias("odds_ratio"),
        F.when(is_new, (eid % 499 + 1) / 1000.0).alias("standard_error"),
        F.when(~is_new, ci_up).alias("ci_upper"),
        F.when(~is_new, ci_lo).alias("ci_lower"),
        F.when(eid % 7 != 0, (eid % 997 + 1) / 1000.0).alias(
            "effect_allele_frequency"
        ),
        (F.lit(10_000) + eid % 500_000).cast("int").alias("n"),
    )
    m_new, e_new = split_pvalue(F.col("p_value"))
    m_old, e_old = pvalue_from_neglog(F.col("neg_log_10_p_value"))
    mantissa = F.when(F.col("is_new_format"), m_new).otherwise(
        F.round(m_old, 6)
    )
    exponent = F.when(F.col("is_new_format"), e_new).otherwise(e_old)
    beta_h, se_h = harmonise_effect(
        F.col("hm_beta"),
        F.col("odds_ratio"),
        F.col("standard_error"),
        F.col("ci_upper"),
        F.col("ci_lower"),
    )
    return (
        raw.select(
            "study_id",
            F.concat_ws(
                "_",
                "chromosome",
                F.col("position").cast("string"),
                "ref",
                "alt",
            ).alias("variant_id"),
            "chromosome",
            F.col("position").cast("int").alias("position"),
            mantissa.alias("p_mantissa"),
            exponent.cast("int").alias("p_exponent"),
            F.round(beta_h, 6).alias("beta"),
            F.round(se_h, 6).alias("standard_error"),
            F.col("effect_allele_frequency").cast("double").alias(
                "eaf_from_source"
            ),
            F.col("n").alias("sample_size"),
        )
        .filter(
            F.col("position").isNotNull()
            & F.col("beta").isNotNull()
            & (F.col("beta") != 0)
        )
    )


GWAS_SUMSTAT_SQL = """
WITH raw AS (
  SELECT event_id,
         'GCST' || lpad(CAST(event_id % 150 AS VARCHAR), 8, '0') AS study_id,
         CAST((event_id % 22) + 1 AS VARCHAR) AS chromosome,
         CASE WHEN event_id % 43 <> 0
              THEN (event_id * 97) % 4000000 END AS position,
         (['A','C','G','T'])[CAST(event_id % 4 AS INT) + 1] AS ref,
         (['A','C','G','T'])[CAST((event_id + 3) % 4 AS INT) + 1] AS alt,
         event_id % 2 = 0 AS is_new,
         ((event_id * 43) % 9999 + 1) / 10000.0 AS p_value,
         ROUND((event_id % 3000) / 100.0 + 0.1, 6) AS neglog,
         CASE WHEN event_id % 17 = 0 THEN 0.0
              ELSE ((event_id % 2001) - 1000) / 400.0 END AS hm_beta,
         0.5 + (event_id % 400) / 100.0 AS odds_ratio,
         (event_id % 499 + 1) / 1000.0 AS standard_error,
         (0.5 + (event_id % 400) / 100.0) * 1.2 AS ci_upper,
         (0.5 + (event_id % 400) / 100.0) * 0.8 AS ci_lower,
         CASE WHEN event_id % 7 <> 0
              THEN (event_id % 997 + 1) / 1000.0 END AS eaf,
         CAST(10000 + event_id % 500000 AS INT) AS n
  FROM events
)
SELECT study_id,
       chromosome || '_' || CAST(position AS VARCHAR) || '_' || ref || '_'
         || alt AS variant_id,
       chromosome,
       CAST(position AS INT) AS position,
       CASE WHEN is_new
            THEN ROUND(p_value / POW(10.0, FLOOR(LOG10(p_value))), 3)
            ELSE ROUND(POW(10.0, CEIL(neglog) - neglog), 6)
       END AS p_mantissa,
       CAST(CASE WHEN is_new THEN FLOOR(LOG10(p_value))
                 ELSE -1 * CEIL(neglog) END AS INT) AS p_exponent,
       ROUND(CASE WHEN is_new THEN hm_beta
                  ELSE LN(odds_ratio) END, 6) AS beta,
       ROUND(CASE WHEN is_new THEN standard_error
                  ELSE ABS(LN(ci_upper) - LN(ci_lower)) / 3.92
             END, 6) AS standard_error,
       CAST(eaf AS DOUBLE) AS eaf_from_source,
       n AS sample_size
FROM raw
WHERE position IS NOT NULL
  AND (CASE WHEN is_new THEN hm_beta ELSE LN(odds_ratio) END) IS NOT NULL
  AND ROUND(CASE WHEN is_new THEN hm_beta
                 ELSE LN(odds_ratio) END, 6) <> 0
"""


REGISTRY["gwas_sumstat_ingest"] = QuerySpec(
    q_gwas_sumstat_ingest, GWAS_SUMSTAT_SQL
)


# --- UKB-PPP (EUR) study index ---------------------------------------------
def q_ukb_ppp_study_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UKB-PPP (EUR) pQTL study index (ukb_ppp_eur/study_index.py:15).

    The reference "peeks" into the harmonised sumstats for nSamples —
    chromosome-22 slice, ``first(N)`` per study (:32). ``first`` is
    order-dependent; replaced with ``min`` (N is constant per study in
    the source, so min == first, but min is deterministic under
    shuffle). Metadata TSV parse (:40): pqtl/UKB_PPP_EUR constants,
    protein trait, plasma biosample, gene id, sumstats location;
    INNER join to the peeked sample sizes; single-ancestry European
    discovery structure → ldPopulationStructure is a single nfe entry
    with relative size 1 (:55).
    """
    part = read_table(spark, sf_dir, "part")
    ev = read_table(spark, sf_dir, "events")
    pk = F.col("p_partkey")
    eid = F.col("event_id")
    study_id = F.concat(F.lit("UKB_PPP_EUR_"), (pk % 800).cast("string"))
    meta = part.select(
        study_id.alias("study_id"),
        F.concat(
            F.lit("PROT_"),
            (pk % 800).cast("string"),
            F.lit(":P"),
            F.lpad((pk % 900).cast("string"), 5, "0"),
        ).alias("trait_from_source"),
        F.concat(
            F.lit("ENSG"), F.lpad((pk % 1200).cast("string"), 11, "0")
        ).alias("gene_id"),
        F.concat(
            F.lit("ukb-ppp/sumstats/"), (pk % 800).cast("string"),
            F.lit(".parquet"),
        ).alias("sumstats_location"),
    ).distinct()
    sumstats = ev.select(
        F.concat(F.lit("UKB_PPP_EUR_"), (eid % 650).cast("string")).alias(
            "study_id"
        ),
        ((eid % 23) + 1).cast("string").alias("chromosome"),
        (F.lit(30_000) + eid % 5_000).cast("int").alias("n"),
    )
    n_samples = (
        sumstats.filter(F.col("chromosome") == "22")
        .groupBy("study_id")
        .agg(F.min("n").cast("int").alias("n_samples"))
    )
    return (
        meta.join(n_samples, on="study_id", how="inner")
        .select(
            "study_id",
            F.lit("pqtl").alias("study_type"),
            F.lit("UKB_PPP_EUR").alias("project_id"),
            "trait_from_source",
            F.lit("UBERON_0001969").alias("biosample_id"),
            "gene_id",
            F.lit(True).alias("has_sumstats"),
            "sumstats_location",
            "n_samples",
            F.concat(
                F.lit("European="), F.col("n_samples").cast("string")
            ).alias("discovery_csv"),
            F.lit("nfe=1000000").alias("ld_pop_ppm_csv"),
        )
    )


UKB_PPP_STUDY_SQL = """
WITH meta AS (
  SELECT DISTINCT
    'UKB_PPP_EUR_' || CAST(p_partkey % 800 AS VARCHAR) AS study_id,
    'PROT_' || CAST(p_partkey % 800 AS VARCHAR) || ':P'
      || lpad(CAST(p_partkey % 900 AS VARCHAR), 5, '0')
      AS trait_from_source,
    'ENSG' || lpad(CAST(p_partkey % 1200 AS VARCHAR), 11, '0') AS gene_id,
    'ukb-ppp/sumstats/' || CAST(p_partkey % 800 AS VARCHAR) || '.parquet'
      AS sumstats_location
  FROM part
),
n_samples AS (
  SELECT 'UKB_PPP_EUR_' || CAST(event_id % 650 AS VARCHAR) AS study_id,
         CAST(MIN(30000 + event_id % 5000) AS INT) AS n_samples
  FROM events
  WHERE CAST((event_id % 23) + 1 AS VARCHAR) = '22'
  GROUP BY 1
)
SELECT m.study_id,
       'pqtl' AS study_type,
       'UKB_PPP_EUR' AS project_id,
       m.trait_from_source,
       'UBERON_0001969' AS biosample_id,
       m.gene_id,
       TRUE AS has_sumstats,
       m.sumstats_location,
       n.n_samples,
       'European=' || CAST(n.n_samples AS VARCHAR) AS discovery_csv,
       'nfe=1000000' AS ld_pop_ppm_csv
FROM meta m
JOIN n_samples n USING (study_id)
"""


REGISTRY["ukb_ppp_study_ingest"] = QuerySpec(
    q_ukb_ppp_study_ingest, UKB_PPP_STUDY_SQL
)


# --- OT variant table → VCF export -----------------------------------------
def q_ot_variant_to_vcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OT variant dataset → VCF export (open_targets/variants.py:69
    ``as_vcf_df``).

    variantId is unioned with the locus array's tag variant ids and
    exploded (:101 safe_array_union — null arrays degrade to the
    non-null side), underscore-split into #CHROM/POS/ID/REF/ALT with
    '.' coalesces for missing fields (:110), QUAL/FILTER/INFO literal
    dots, a DISTINCT, the ACGT-or-dot regex allele gate and the
    (chrom, pos) ordering (:129). The rsID→coordinate mapping half
    (:26 map_rsids_to_variant_ids) calls the Ensembl REST API —
    deliberately not mirrored (not query-shaped).
    Emitted unordered here (the driver hash is order-insensitive; the
    VCF writer would apply the final orderBy at write time).
    """
    ev = read_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    bases = F.array(*[F.lit(b) for b in _BASES])
    mk_vid = lambda salt: F.concat_ws(  # noqa: E731
        "_",
        ((eid % 22) + 1).cast("string"),
        (((eid + salt) * 67) % 3_000_000).cast("string"),
        F.element_at(bases, ((eid + salt) % 4 + 1).cast("int")),
        F.element_at(bases, ((eid + salt + 1) % 4 + 1).cast("int")),
    )
    raw = ev.select(
        F.when(eid % 13 != 0, mk_vid(0)).alias("variant_id"),
        F.when(
            eid % 5 == 0,
            F.concat(F.lit("rs"), (eid % 100_000).cast("string")),
        ).alias("variant_rs_id"),
        F.when(
            eid % 3 == 0, F.array(mk_vid(1), mk_vid(2))
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("locus_variant_ids"),
        # A malformed id exercising the allele regex gate:
        F.when(eid % 29 == 0, F.lit(True)).otherwise(F.lit(False)).alias(
            "malform"
        ),
    ).withColumn(
        "variant_id",
        F.when(
            F.col("malform") & F.col("variant_id").isNotNull(),
            F.concat(F.col("variant_id"), F.lit("N")),
        ).otherwise(F.col("variant_id")),
    )
    exploded = (
        raw.filter(F.col("variant_id").isNotNull())
        .select(
            "variant_rs_id",
            F.explode(
                F.array_union(
                    F.array(F.col("variant_id")), F.col("locus_variant_ids")
                )
            ).alias("vid"),
        )
    )
    parts = F.split(F.col("vid"), "_")
    return (
        exploded.select(
            F.coalesce(F.try_element_at(parts, F.lit(1)), F.lit(".")).alias(
                "chrom"
            ),
            # r9 advisory fix: a plain cast would THROW under ANSI mode
            # if the '.' fallback (or any non-numeric second field)
            # were ever hit; try_cast yields NULL, which the pos
            # IS NOT NULL filter below then drops — same contract as
            # the oracle's TRY_CAST.
            F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("."))
            .try_cast("int")
            .alias("pos"),
            F.coalesce(F.col("variant_rs_id"), F.lit(".")).alias("id"),
            F.coalesce(F.try_element_at(parts, F.lit(3)), F.lit(".")).alias(
                "ref"
            ),
            F.coalesce(F.try_element_at(parts, F.lit(4)), F.lit(".")).alias(
                "alt"
            ),
            F.lit(".").alias("qual"),
            F.lit(".").alias("filter"),
            F.lit(".").alias("info"),
        )
        .distinct()
        .filter(
            (F.col("chrom") != ".")
            & F.col("pos").isNotNull()
            & F.col("ref").rlike("^[GCTA.]*$")
            & F.col("alt").rlike("^[GCTA.]*$")
        )
    )


OT_VCF_SQL = """
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 13 <> 0 THEN
           CAST((event_id % 22) + 1 AS VARCHAR) || '_'
           || CAST((event_id * 67) % 3000000 AS VARCHAR) || '_'
           || (['A','C','G','T'])[CAST(event_id % 4 AS INT) + 1] || '_'
           || (['A','C','G','T'])[CAST((event_id + 1) % 4 AS INT) + 1]
           || CASE WHEN event_id % 29 = 0 THEN 'N' ELSE '' END
         END AS variant_id,
         CASE WHEN event_id % 5 = 0
              THEN 'rs' || CAST(event_id % 100000 AS VARCHAR)
         END AS variant_rs_id,
         CASE WHEN event_id % 3 = 0 THEN
           [CAST((event_id % 22) + 1 AS VARCHAR) || '_'
              || CAST(((event_id + 1) * 67) % 3000000 AS VARCHAR) || '_'
              || (['A','C','G','T'])[CAST((event_id + 1) % 4 AS INT) + 1]
              || '_'
              || (['A','C','G','T'])[CAST((event_id + 2) % 4 AS INT) + 1],
            CAST((event_id % 22) + 1 AS VARCHAR) || '_'
              || CAST(((event_id + 2) * 67) % 3000000 AS VARCHAR) || '_'
              || (['A','C','G','T'])[CAST((event_id + 2) % 4 AS INT) + 1]
              || '_'
              || (['A','C','G','T'])[CAST((event_id + 3) % 4 AS INT) + 1]]
         ELSE CAST([] AS VARCHAR[]) END AS locus_variant_ids
  FROM events
),
exploded AS (
  SELECT variant_rs_id, u.vid
  FROM raw,
       unnest(list_distinct(list_prepend(variant_id, locus_variant_ids)))
         AS u(vid)
  WHERE variant_id IS NOT NULL
)
SELECT DISTINCT
       COALESCE(str_split(vid, '_')[1], '.') AS chrom,
       TRY_CAST(str_split(vid, '_')[2] AS INT) AS pos,
       COALESCE(variant_rs_id, '.') AS id,
       COALESCE(str_split(vid, '_')[3], '.') AS ref,
       COALESCE(str_split(vid, '_')[4], '.') AS alt,
       '.' AS qual, '.' AS filter, '.' AS info
FROM exploded
WHERE COALESCE(str_split(vid, '_')[1], '.') <> '.'
  AND TRY_CAST(str_split(vid, '_')[2] AS INT) IS NOT NULL
  AND regexp_full_match(COALESCE(str_split(vid, '_')[3], '.'), '[GCTA.]*')
  AND regexp_full_match(COALESCE(str_split(vid, '_')[4], '.'), '[GCTA.]*')
"""


REGISTRY["ot_variant_to_vcf"] = QuerySpec(q_ot_variant_to_vcf, OT_VCF_SQL)
