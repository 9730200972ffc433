"""Study-index assembly dialects (SURVEY §2.H — datasource breadth, r8).

Closes the last partially-mirrored reference datasource trees — the
study-INDEX side that sits on top of the already-mirrored sumstats /
finemapping ingestion dialects:

- ``gwas_study_ingest`` — GWAS Catalog study index
  (datasource/gwas_catalog/study_index.py): raw study-table parse
  (EFO URI parsing, cohort pipe-split, trait fallback), the ancestry
  LUT annotation with comma-separated multi-ancestry EVEN-SPLIT of
  sample counts, LD-population mapping with relative sample sizes,
  the European-deconvolution pivot, and the initialSampleSize
  cases/controls string arithmetic.
- ``gwas_study_split`` — multi-trait study splitting
  (datasource/gwas_catalog/study_splitter.py): sub-study id minting
  via dense_rank, trait/EFO consolidation between study- and
  association-level annotation, association re-keying with the
  ambiguity + top-hit QC flags.
- ``gwas_study_curation`` — OT in-house curation annotation
  (datasource/gwas_catalog/study_index_ot_curation.py +
  study_index.py ``annotate_from_study_curation``): curation-table
  parse (pipe-split flag lists), study-type override, analysis-flag
  union, and the NO_OT_CURATION quality flag.

All raw shapes are derived deterministically from the synthetic
tables (orders / lineitem / customer / supplier) with exact integer
arithmetic; doubles that cross exp/ln or division are rounded to the
repo-wide 6 dp parity rule (ratios are emitted as ppm integers so the
CSV flattening is byte-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.sources.readers import read_table

REGISTRY: dict[str, QuerySpec] = {}


# --- GWAS Catalog study index ----------------------------------------------
# Ancestry label → LD reference panel, re-typed from the reference's
# public asset assets/data/gwas_population_2_LD_panel_map.json.
_GWAS_POP_2_LD = (
    ("European", "nfe"),
    ("African American or Afro-Caribbean", "afr"),
    ("Native American", "amr"),
    ("Asian unspecified", "eas"),
    ("Hispanic or Latin American", "amr"),
    ("East Asian", "eas"),
    ("Central Asian", "eas"),
    ("Oceanian", "eas"),
    ("South East Asian", "eas"),
    ("Other admixed ancestry", "nfe"),
    ("African unspecified", "afr"),
    ("Sub-Saharan African", "afr"),
    (
        "Greater Middle Eastern (Middle Eastern, North African or Persian)",
        "eas",
    ),
    ("Aboriginal Australian", "eas"),
    ("Other", "nfe"),
    ("South Asian", "eas"),
    ("NR", "nfe"),
    ("Finnish", "fin"),
    ("African", "afr"),
    ("Admixed American", "amr"),
    ("Icelandic", "nfe"),
)

_TRAITS = (
    "type 2 diabetes",
    "asthma",
    "height",
    "body mass index",
    "coronary artery disease",
    "rheumatoid arthritis",
    "breast carcinoma",
    "schizophrenia",
    "LDL cholesterol",
    "atrial fibrillation",
    "inflammatory bowel disease",
)
_JOURNALS = ("Nat Genet", "Nat Commun", "PLoS Genet", "Hum Mol Genet", "AJHG")
_COHORT_PICKS = ("FHS", "CaPS", "Estonia", "BioME", "GERA", "FINRISK")
# The ancestry labels exercised by the synthetic LUT. Index 5 and 8 are
# comma-separated multi-ancestry annotations (the even-split path);
# index 6 carries a comma INSIDE parentheses, which the reference's
# split regex deliberately does not split on (study_index.py:91).
_ANC_LABELS = (
    "European",
    "African",
    "East Asian",
    "South Asian",
    "Finnish",
    "European, African",
    "Greater Middle Eastern (Middle Eastern, North African or Persian)",
    "Hispanic or Latin American",
    "European, East Asian, African",
)

# The reference's discovery-ancestry split regex (study_index.py:91):
# comma+space NOT inside parentheses (negative lookahead).
_ANC_SPLIT_RE = r",\s(?![^()]*\))"


def _accession(key_col):
    return F.concat(F.lit("GCST"), F.lpad(key_col.cast("string"), 8, "0"))


def _raw_gwas_studies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic GWAS-Catalog raw study table (one row per order)."""
    orders = read_table(spark, sf_dir, "orders")
    ok = F.col("o_orderkey")
    uri1 = F.concat(
        F.lit("http://www.ebi.ac.uk/efo/EFO_"),
        F.lpad(((ok * 7) % 99991).cast("string"), 7, "0"),
    )
    uri2 = F.concat(
        F.lit("http://purl.obolibrary.org/obo/MONDO_"),
        F.lpad(((ok * 11) % 99991).cast("string"), 7, "0"),
    )
    n1 = (F.lit(1000) + (ok * 13) % 9000).cast("long")
    n2 = (F.lit(10_000) + (ok * 17) % 90_000).cast("long")
    # Hand-built thousands separator so both engines emit the same
    # "12,345"-style token the reference's comma-strip parse targets.
    n2_fmt = F.concat(
        F.expr("(10000 + (o_orderkey * 17) % 90000) div 1000").cast("string"),
        F.lit(","),
        F.lpad((n2 % 1000).cast("string"), 3, "0"),
    )
    sample_str = (
        F.when(ok % 41 == 0, F.lit(None).cast("string"))
        .when(
            ok % 4 == 0,
            F.concat(
                n2_fmt,
                F.lit(" European cases, "),
                n1.cast("string"),
                F.lit(" European controls"),
            ),
        )
        .when(
            ok % 4 == 1,
            F.concat(n1.cast("string"), F.lit(" Finnish individuals")),
        )
        .when(
            ok % 4 == 2,
            F.concat(
                n2_fmt,
                F.lit(" East Asian individuals, "),
                n1.cast("string"),
                F.lit(" European individuals"),
            ),
        )
        .otherwise(
            F.concat(
                n1.cast("string"),
                F.lit(" African cases, "),
                n1.cast("string"),
                F.lit(" African controls"),
            )
        )
    )
    cohort_mid = F.element_at(
        F.array(*[F.lit(c) for c in _COHORT_PICKS]), (ok % 6 + 1).cast("int")
    )
    return orders.select(
        F.when(ok % 97 != 0, _accession(ok)).alias("accession"),
        ok.alias("src_key"),
        (F.lit(30_000_000) + ok % 999_983).cast("string").alias("pubmed_id"),
        F.concat(F.lit("Author_"), (ok % 500).cast("string")).alias(
            "first_author"
        ),
        F.col("o_orderdate").cast("string").alias("pub_date"),
        F.element_at(
            F.array(*[F.lit(j) for j in _JOURNALS]), (ok % 5 + 1).cast("int")
        ).alias("journal"),
        F.concat(
            F.lit("Genome-wide study "), (ok % 1000).cast("string")
        ).alias("title"),
        F.when(
            ok % 53 != 0,
            F.element_at(
                F.array(*[F.lit(t) for t in _TRAITS]), (ok % 11 + 1).cast("int")
            ),
        ).alias("disease_trait"),
        F.when(ok % 13 != 0, F.lit(None).cast("string"))
        .when(ok % 3 == 0, F.concat_ws(",", uri1, uri2, uri1))
        .when(ok % 3 == 1, uri1)
        .otherwise(F.concat_ws(",", uri1, uri2))
        .alias("mapped_trait_uri"),
        F.when(ok % 7 == 0, uri2).alias("background_trait_uri"),
        F.when(ok % 19 == 1, F.lit(""))
        .when(
            ok % 19 != 0,
            F.concat(F.lit("UKB|"), cohort_mid, F.lit("|UKB")),
        )
        .alias("cohort"),
        sample_str.alias("initial_sample_size"),
        (ok % 2 == 0).alias("has_sumstats"),
    )


def _raw_gwas_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic GWAS-Catalog ancestry LUT (one row per lineitem)."""
    li = read_table(spark, sf_dir, "lineitem")
    lk, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    return li.select(
        _accession(lk).alias("study_id"),
        F.when(F.col("l_linenumber") % 3 != 0, F.lit("initial"))
        .otherwise(F.lit("replication"))
        .alias("stage"),
        F.element_at(
            F.array(*[F.lit(a) for a in _ANC_LABELS]), (pk % 9 + 1).cast("int")
        ).alias("ancestry_label"),
        (F.lit(100) + (pk * 7) % 50_000).cast("long").alias("n_individuals"),
        F.when(sk % 11 == 0, F.lit("Finnish cohort individuals"))
        .when(sk % 11 == 1, F.lit("Icelandic population"))
        .otherwise(F.lit("population-based cohort"))
        .alias("sample_description"),
    )


def q_gwas_study_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GWAS Catalog study-index assembly.

    Mirrors datasource/gwas_catalog/study_index.py end to end:

    - ``_parse_study_table`` (:243): accession fallback (the reference
      coalesces to ``monotonically_increasing_id()``, which is not
      reproducible across runs — re-architected to a deterministic
      source-key surrogate), trait fallback 'Unreported', EFO URI
      parsing (common/processing.py:21 ``parse_efos`` — split on ','
      then last '/'-component, distinct; sorted here so the flattened
      CSV is order-stable), cohort pipe-split with the
      non-null/non-empty guard (:215 ``parse_cohorts``).
    - ``annotate_ancestries`` (:419): stage split, and the
      ``_parse_discovery_samples`` (:37) semantics re-expressed
      Spark-first: the reference walks nested higher-order functions
      over per-study struct arrays; at 100 TB grain the same algebra
      is a distinct→explode→整groupBy — dedup identical
      (label,count) pairs per study+stage (collect_set), split
      comma-separated multi-ancestry labels on the lookahead regex
      (:91 — commas inside parentheses survive), EVEN-split each
      count across its labels (truncating division, :118), and sum
      per (study, ancestry). Replication-stage labels are kept
      UNSPLIT, matching the reference (only `initial` flows through
      the parser, :481).
    - ``aggregate_and_map_ancestries`` (dataset/study_index.py:182):
      ancestry→LD-panel map (public asset
      gwas_population_2_LD_panel_map.json), per-panel sums, relative
      sample size emitted as a ppm integer so the CSV is exact.
    - European deconvolution (:497): Finnish/Icelandic description
      exclusion, European-vs-other pivot sums. (The reference computes
      then drops these columns; retained here as output so the logic
      is oracle-verified.)
    - ``annotate_discovery_sample_sizes`` (:545): split the
      initialSampleSize string on ',\\s+', strip in-number commas,
      extract the leading integer, split cases/controls by substring,
      and sum per study.
    """
    studies = _raw_gwas_studies(spark, sf_dir)
    anc = _raw_gwas_ancestry(spark, sf_dir)

    parse_efos = lambda c: F.when(  # noqa: E731
        c.isNotNull(),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.split(c, ","),
                        lambda u: F.element_at(F.split(u, "/"), -1),
                    )
                )
            ),
            ";",
        ),
    )
    parsed = studies.select(
        F.coalesce(
            F.col("accession"),
            F.concat(F.lit("NOID_"), F.col("src_key").cast("string")),
        ).alias("study_id"),
        F.lit("GCST").alias("project_id"),
        F.lit("gwas").alias("study_type"),
        "pubmed_id",
        "first_author",
        "pub_date",
        "journal",
        "title",
        F.coalesce(F.col("disease_trait"), F.lit("Unreported")).alias("trait"),
        parse_efos(F.col("mapped_trait_uri")).alias("efo_csv"),
        parse_efos(F.col("background_trait_uri")).alias("background_efo_csv"),
        F.when(
            F.col("cohort").isNotNull() & (F.col("cohort") != ""),
            F.array_join(F.array_distinct(F.split(F.col("cohort"), r"\|")), ";"),
        ).alias("cohorts_csv"),
        "initial_sample_size",
        "has_sumstats",
    )

    # Distinct (label,count) pairs per study+stage = the reference's
    # collect_set dedup, kept relational.
    pairs = anc.select(
        "study_id", "stage", "ancestry_label", "n_individuals"
    ).distinct()
    exploded = pairs.select(
        "study_id",
        "stage",
        F.explode(F.split(F.col("ancestry_label"), _ANC_SPLIT_RE)).alias(
            "ancestry"
        ),
        F.expr(
            "n_individuals div size(split(ancestry_label,"
            f" '{_ANC_SPLIT_RE}'))"
        ).alias("part_count"),
    )
    disc_by_anc = (
        exploded.filter(F.col("stage") == "initial")
        .groupBy("study_id", "ancestry")
        .agg(F.sum("part_count").alias("sample_size"))
    )
    disc_csv = disc_by_anc.groupBy("study_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat_ws("=", "ancestry", F.col("sample_size"))
                )
            ),
            ";",
        ).alias("discovery_csv")
    )
    repl_csv = (
        pairs.filter(F.col("stage") == "replication")
        .groupBy("study_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_set(
                        F.concat_ws(
                            "=", "ancestry_label", F.col("n_individuals")
                        )
                    )
                ),
                ";",
            ).alias("replication_csv")
        )
    )
    ld_map = F.create_map(
        *[F.lit(x) for pair in _GWAS_POP_2_LD for x in pair]
    )
    ld_by_pop = disc_by_anc.groupBy(
        "study_id", ld_map[F.col("ancestry")].alias("ld_pop")
    ).agg(F.sum("sample_size").alias("pop_size"))
    w_study = Window.partitionBy("study_id")
    ld_csv = (
        ld_by_pop.withColumn("total", F.sum("pop_size").over(w_study))
        .select(
            "study_id",
            F.concat_ws(
                "=",
                "ld_pop",
                F.round(F.col("pop_size") / F.col("total") * 1e6)
                .cast("long")
                .cast("string"),
            ).alias("entry"),
        )
        .groupBy("study_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("entry")), ";").alias(
                "ld_pop_ppm_csv"
            )
        )
    )
    eur = (
        anc.filter(F.col("stage") == "initial")
        .withColumn(
            "flag",
            F.when(
                F.col("sample_description").contains("Finnish"), F.lit("other")
            )
            .when(
                F.col("sample_description").contains("Icelandic"),
                F.lit("other"),
            )
            .when(F.col("ancestry_label") == "European", F.lit("european"))
            .otherwise(F.lit("other")),
        )
        .groupBy("study_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("flag") == "european", F.col("n_individuals"))
                ),
                F.lit(0),
            ).alias("eur_initial"),
            F.coalesce(
                F.sum(
                    F.when(F.col("flag") == "other", F.col("n_individuals"))
                ),
                F.lit(0),
            ).alias("other_initial"),
        )
    )
    samples = (
        parsed.select(
            "study_id",
            F.explode_outer(
                F.split(F.col("initial_sample_size"), r",\s+")
            ).alias("samples"),
        )
        .withColumn(
            "n",
            F.regexp_extract(
                F.regexp_replace(F.col("samples"), ",", ""), r"[0-9]+", 0
            ).cast("long"),
        )
        .groupBy("study_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("samples").contains("cases"), F.col("n"))
                ),
                F.lit(0),
            ).alias("n_cases"),
            F.coalesce(
                F.sum(
                    F.when(F.col("samples").contains("controls"), F.col("n"))
                ),
                F.lit(0),
            ).alias("n_controls"),
            F.sum("n").alias("n_samples"),
        )
    )
    return (
        parsed.join(samples, on="study_id", how="left")
        .join(disc_csv, on="study_id", how="left")
        .join(repl_csv, on="study_id", how="left")
        .join(ld_csv, on="study_id", how="left")
        .join(eur, on="study_id", how="left")
    )


def _gwas_study_sql() -> str:
    traits = "(['" + "','".join(_TRAITS) + "'])"
    journals = "(['" + "','".join(_JOURNALS) + "'])"
    cohorts = "(['" + "','".join(_COHORT_PICKS) + "'])"
    anc_labels = (
        "(['" + "','".join(a.replace("'", "''") for a in _ANC_LABELS) + "'])"
    )
    ld_map_cases = "\n           ".join(
        f"WHEN '{label}' THEN '{pop}'" for label, pop in _GWAS_POP_2_LD
    )
    return f"""
WITH raw_studies AS (
  SELECT CASE WHEN o_orderkey % 97 <> 0
              THEN 'GCST' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') END
           AS accession,
         o_orderkey AS src_key,
         CAST(30000000 + o_orderkey % 999983 AS VARCHAR) AS pubmed_id,
         'Author_' || CAST(o_orderkey % 500 AS VARCHAR) AS first_author,
         CAST(o_orderdate AS VARCHAR) AS pub_date,
         {journals}[CAST(o_orderkey % 5 AS INT) + 1] AS journal,
         'Genome-wide study ' || CAST(o_orderkey % 1000 AS VARCHAR) AS title,
         CASE WHEN o_orderkey % 53 <> 0
              THEN {traits}[CAST(o_orderkey % 11 AS INT) + 1] END
           AS disease_trait,
         'http://www.ebi.ac.uk/efo/EFO_'
           || lpad(CAST((o_orderkey * 7) % 99991 AS VARCHAR), 7, '0') AS uri1,
         'http://purl.obolibrary.org/obo/MONDO_'
           || lpad(CAST((o_orderkey * 11) % 99991 AS VARCHAR), 7, '0') AS uri2,
         CAST(10000 + (o_orderkey * 17) % 90000 AS BIGINT) AS n2,
         CAST(1000 + (o_orderkey * 13) % 9000 AS BIGINT) AS n1,
         o_orderkey % 2 = 0 AS has_sumstats
  FROM orders
),
raw2 AS (
  SELECT *,
         CASE WHEN o2.src_key % 13 <> 0 THEN NULL
              WHEN o2.src_key % 3 = 0 THEN uri1 || ',' || uri2 || ',' || uri1
              WHEN o2.src_key % 3 = 1 THEN uri1
              ELSE uri1 || ',' || uri2 END AS mapped_trait_uri,
         CASE WHEN o2.src_key % 7 = 0 THEN uri2 END AS background_trait_uri,
         CASE WHEN o2.src_key % 19 = 1 THEN ''
              WHEN o2.src_key % 19 <> 0
              THEN 'UKB|' || {cohorts}[CAST(o2.src_key % 6 AS INT) + 1]
                   || '|UKB' END AS cohort,
         CAST(n2 // 1000 AS VARCHAR) || ','
           || lpad(CAST(n2 % 1000 AS VARCHAR), 3, '0') AS n2_fmt,
         CASE WHEN o2.src_key % 41 = 0 THEN NULL
              WHEN o2.src_key % 4 = 0
              THEN CAST(n2 // 1000 AS VARCHAR) || ','
                   || lpad(CAST(n2 % 1000 AS VARCHAR), 3, '0')
                   || ' European cases, ' || CAST(n1 AS VARCHAR)
                   || ' European controls'
              WHEN o2.src_key % 4 = 1
              THEN CAST(n1 AS VARCHAR) || ' Finnish individuals'
              WHEN o2.src_key % 4 = 2
              THEN CAST(n2 // 1000 AS VARCHAR) || ','
                   || lpad(CAST(n2 % 1000 AS VARCHAR), 3, '0')
                   || ' East Asian individuals, ' || CAST(n1 AS VARCHAR)
                   || ' European individuals'
              ELSE CAST(n1 AS VARCHAR) || ' African cases, '
                   || CAST(n1 AS VARCHAR) || ' African controls'
         END AS initial_sample_size
  FROM raw_studies o2
),
parsed AS (
  SELECT COALESCE(accession, 'NOID_' || CAST(src_key AS VARCHAR)) AS study_id,
         'GCST' AS project_id, 'gwas' AS study_type,
         pubmed_id, first_author, pub_date, journal, title,
         COALESCE(disease_trait, 'Unreported') AS trait,
         CASE WHEN mapped_trait_uri IS NOT NULL THEN
           array_to_string(list_sort(list_distinct(list_transform(
             str_split(mapped_trait_uri, ','),
             u -> list_extract(str_split(u, '/'), len(str_split(u, '/')))
           ))), ';') END AS efo_csv,
         CASE WHEN background_trait_uri IS NOT NULL THEN
           array_to_string(list_sort(list_distinct(list_transform(
             str_split(background_trait_uri, ','),
             u -> list_extract(str_split(u, '/'), len(str_split(u, '/')))
           ))), ';') END AS background_efo_csv,
         CASE WHEN cohort IS NOT NULL AND cohort <> ''
              THEN array_to_string(list_distinct(str_split(cohort, '|')), ';')
         END AS cohorts_csv,
         initial_sample_size, has_sumstats
  FROM raw2
),
raw_anc AS (
  SELECT 'GCST' || lpad(CAST(l_orderkey AS VARCHAR), 8, '0') AS study_id,
         CASE WHEN l_linenumber % 3 <> 0 THEN 'initial'
              ELSE 'replication' END AS stage,
         {anc_labels}[CAST(l_partkey % 9 AS INT) + 1] AS ancestry_label,
         CAST(100 + (l_partkey * 7) % 50000 AS BIGINT) AS n_individuals,
         CASE WHEN l_suppkey % 11 = 0 THEN 'Finnish cohort individuals'
              WHEN l_suppkey % 11 = 1 THEN 'Icelandic population'
              ELSE 'population-based cohort' END AS sample_description
  FROM lineitem
),
pairs AS (
  SELECT DISTINCT study_id, stage, ancestry_label, n_individuals
  FROM raw_anc
),
-- RE2 has no lookahead: protect the single in-parens comma, split on
-- ', ', then restore. Matches the Spark side's lookahead regex for
-- every label this data carries.
exploded AS (
  SELECT study_id, stage,
         replace(part, chr(1), ', ') AS ancestry,
         n_individuals // len(str_split(
           regexp_replace(ancestry_label,
                          '\\(([^)]*), ([^)]*)\\)', '(\\1' || chr(1) || '\\2)',
                          'g'), ', ')) AS part_count
  FROM pairs,
       unnest(str_split(
         regexp_replace(ancestry_label,
                        '\\(([^)]*), ([^)]*)\\)', '(\\1' || chr(1) || '\\2)',
                        'g'), ', ')) AS u(part)
),
disc_by_anc AS (
  SELECT study_id, ancestry, CAST(SUM(part_count) AS BIGINT) AS sample_size
  FROM exploded WHERE stage = 'initial'
  GROUP BY study_id, ancestry
),
disc_csv AS (
  SELECT study_id,
         array_to_string(list_sort(list(ancestry || '='
           || CAST(sample_size AS VARCHAR))), ';') AS discovery_csv
  FROM disc_by_anc GROUP BY study_id
),
repl_csv AS (
  SELECT study_id,
         array_to_string(list_sort(list(DISTINCT ancestry_label || '='
           || CAST(n_individuals AS VARCHAR))), ';') AS replication_csv
  FROM pairs WHERE stage = 'replication'
  GROUP BY study_id
),
ld_by_pop AS (
  SELECT study_id,
         CASE ancestry {ld_map_cases} END AS ld_pop,
         CAST(SUM(sample_size) AS BIGINT) AS pop_size
  FROM disc_by_anc
  GROUP BY 1, 2
),
ld_csv AS (
  SELECT study_id,
         array_to_string(list_sort(list(ld_pop || '='
           || CAST(CAST(ROUND(pop_size / total * 1000000.0, 0) AS BIGINT)
                   AS VARCHAR))), ';') AS ld_pop_ppm_csv
  FROM (SELECT *, SUM(pop_size) OVER (PARTITION BY study_id) AS total
        FROM ld_by_pop)
  GROUP BY study_id
),
eur AS (
  SELECT study_id,
         CAST(COALESCE(SUM(CASE WHEN flag = 'european'
                                THEN n_individuals END), 0) AS BIGINT)
           AS eur_initial,
         CAST(COALESCE(SUM(CASE WHEN flag = 'other'
                                THEN n_individuals END), 0) AS BIGINT)
           AS other_initial
  FROM (SELECT study_id, n_individuals,
               CASE WHEN contains(sample_description, 'Finnish') THEN 'other'
                    WHEN contains(sample_description, 'Icelandic') THEN 'other'
                    WHEN ancestry_label = 'European' THEN 'european'
                    ELSE 'other' END AS flag
        FROM raw_anc WHERE stage = 'initial')
  GROUP BY study_id
),
samples AS (
  SELECT study_id,
         CAST(COALESCE(SUM(CASE WHEN contains(tok, 'cases') THEN n END), 0)
              AS BIGINT) AS n_cases,
         CAST(COALESCE(SUM(CASE WHEN contains(tok, 'controls') THEN n END), 0)
              AS BIGINT) AS n_controls,
         CAST(SUM(n) AS BIGINT) AS n_samples
  FROM (SELECT p.study_id, u.tok,
               CAST(NULLIF(regexp_extract(replace(u.tok, ',', ''),
                                          '[0-9]+', 0), '') AS BIGINT) AS n
        FROM parsed p
        LEFT JOIN LATERAL unnest(str_split_regex(
                 p.initial_sample_size, ',\\s+')) AS u(tok) ON TRUE)
  GROUP BY study_id
)
SELECT p.*, s.n_cases, s.n_controls, s.n_samples,
       d.discovery_csv, r.replication_csv, l.ld_pop_ppm_csv,
       e.eur_initial, e.other_initial
FROM parsed p
LEFT JOIN samples s USING (study_id)
LEFT JOIN disc_csv d USING (study_id)
LEFT JOIN repl_csv r USING (study_id)
LEFT JOIN ld_csv l USING (study_id)
LEFT JOIN eur e USING (study_id)
"""


REGISTRY["gwas_study_ingest"] = QuerySpec(q_gwas_study_ingest, _gwas_study_sql())
