"""Locus-to-gene (L2G) and validation/ingestion queries (SURVEY §2 extras).

Re-expresses gentropy's L2G feature engineering + scoring and the
index-validation / ingestion surfaces:

- gene index: a deterministic interval table derived from ``part``
  (the synthetic stand-in for the Ensembl target index the reference
  builds in dataset/target_index.py).
- v2g_distance: variant→gene distance weighting, the core of
  dataset/intervals.py + l2g_features distance features.
- l2g_feature_matrix: per (locus lead, gene) feature assembly —
  dataset/l2g_feature_matrix.py shape.
- l2g_score: fixed-weight logistic scorer standing in for the GBM in
  dataset/l2g_prediction.py (the feature→score contract is identical;
  swap in a trained booster without touching the plan).
- study_validation: flag loci referencing unknown studies —
  study_locus.py:160 ``validate_study``.
- props_json_parse: malformed-tolerant JSON ingestion of the events
  props payload — the datasource-adapter surface (F4).
- enrichment_odds_ratio: 2×2 contingency enrichment with χ² p-value —
  method/drug_enrichment_from_evid.py shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gentropy_spark.functions.distributions import chi2_sf_1df_col, chi2_sf_1df_sql
from gentropy_spark.plans.genomics import SUMSTATS_SQL, sumstats
from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.sources.readers import read_table

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC in µs
GENE_SPACING_US = 21_600_000_000  # 6 h
GENE_WIDTH_US = 14_400_000_000  # 4 h
V2G_FLANK_US = 3_600_000_000  # 1 h


def gene_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic gene interval table derived from part."""
    part = read_table(spark, sf_dir, "part")
    contig = F.element_at(
        F.array(*[F.lit(t) for t in EVENT_TYPES]),
        (F.col("p_partkey") % 5 + 1).cast("int"),
    )
    start = BASE_US + F.expr("p_partkey div 5") * GENE_SPACING_US
    return part.select(
        F.col("p_partkey").alias("gene_id"),
        contig.alias("contig"),
        start.alias("gene_start"),
        (start + GENE_WIDTH_US).alias("gene_end"),
    )


GENE_INDEX_SQL = f"""
  SELECT p_partkey AS gene_id,
         (['click','view','purchase','signup','error'])[(p_partkey % 5) + 1] AS contig,
         {BASE_US} + (p_partkey // 5) * {GENE_SPACING_US} AS gene_start,
         {BASE_US} + (p_partkey // 5) * {GENE_SPACING_US} + {GENE_WIDTH_US} AS gene_end
  FROM part
"""


# --- v2g distance weighting ----------------------------------------------
def q_v2g_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variants joined to genes within flank; linear distance decay weight.

    The gene index is tiny → broadcast; the range predicate prunes on
    the contig equi-key first (AQE handles the rest at scale).
    """
    variants = sumstats(spark, sf_dir).filter(F.col("signif") >= 50.0)
    genes = gene_index(spark, sf_dir)
    dist = F.greatest(
        F.col("gene_start") - F.col("pos"),
        F.col("pos") - F.col("gene_end"),
        F.lit(0),
    )
    # Tile equi-join: a contig-only join would build |variants|x|genes/contig|
    # rows before the range filter. Genes sit on a regular grid, so each
    # variant can only reach tiles k_lo..k_hi (≤2 of them) — explode those
    # and equi-join on (contig, tile); the exact range predicate stays.
    genes_k = genes.withColumn(
        "gk", F.expr(f"(gene_start - {BASE_US}) div {GENE_SPACING_US}")
    )
    k_hi = F.expr(f"(pos - {BASE_US} + {V2G_FLANK_US}) div {GENE_SPACING_US}")
    k_lo = F.expr(
        f"(pos - {BASE_US} - {GENE_WIDTH_US} - {V2G_FLANK_US}) div {GENE_SPACING_US}"
    )
    vars_k = variants.withColumn(
        "gk", F.explode(F.array_distinct(F.array(k_lo, k_hi)))
    )
    joined = vars_k.join(F.broadcast(genes_k), on=["contig", "gk"], how="inner").filter(
        (F.col("pos") >= F.col("gene_start") - V2G_FLANK_US)
        & (F.col("pos") <= F.col("gene_end") + V2G_FLANK_US)
    )
    return joined.select(
        "point_id",
        "study_id",
        "contig",
        "gene_id",
        dist.alias("distance_us"),
        F.round(1.0 - dist / F.lit(float(V2G_FLANK_US)), 6).alias("v2g_weight"),
    )


V2G_SQL = f"""
WITH variants AS (SELECT * FROM ({SUMSTATS_SQL}) WHERE signif >= 50.0),
genes AS ({GENE_INDEX_SQL})
SELECT point_id, study_id, v.contig, gene_id,
       GREATEST(gene_start - pos, pos - gene_end, 0) AS distance_us,
       ROUND(1.0 - GREATEST(gene_start - pos, pos - gene_end, 0)
             / {float(V2G_FLANK_US)!r}, 6) AS v2g_weight
FROM variants v
JOIN genes g ON v.contig = g.contig
WHERE pos >= gene_start - {V2G_FLANK_US} AND pos <= gene_end + {V2G_FLANK_US}
"""


# --- L2G feature matrix ---------------------------------------------------
def q_l2g_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lead variant, gene): nearest-distance weight, in-body signal
    mass, and per-lead gene count — the distance-feature family of
    dataset/l2g_features/distance.py re-shaped."""
    v2g = q_v2g_distance(spark, sf_dir)
    per_pair = v2g.groupBy("point_id", "study_id", "contig", "gene_id").agg(
        F.max("v2g_weight").alias("max_weight"),
        F.count("*").alias("n_hits"),
    )
    w = Window.partitionBy("point_id", "study_id")
    return per_pair.select(
        "point_id",
        "study_id",
        "contig",
        "gene_id",
        "max_weight",
        "n_hits",
        F.count("*").over(w).alias("genes_in_flank"),
        F.round(
            F.col("max_weight")
            / F.sum(F.col("max_weight").cast("decimal(38,6)")).over(w).cast("double"),
            6,
        ).alias("rel_weight"),
    )


L2G_FEAT_SQL = f"""
WITH v2g AS ({V2G_SQL}),
per_pair AS (
  SELECT point_id, study_id, contig, gene_id,
         MAX(v2g_weight) AS max_weight, COUNT(*) AS n_hits
  FROM v2g GROUP BY 1, 2, 3, 4
)
SELECT point_id, study_id, contig, gene_id, max_weight, n_hits,
       COUNT(*) OVER (PARTITION BY point_id, study_id) AS genes_in_flank,
       ROUND(max_weight / CAST(SUM(CAST(max_weight AS DECIMAL(38,6)))
             OVER (PARTITION BY point_id, study_id) AS DOUBLE), 6) AS rel_weight
FROM per_pair
"""


# --- L2G scorer -----------------------------------------------------------
L2G_W = {"max_weight": 2.0, "rel_weight": 1.5, "genes_in_flank": -0.2}
L2G_B = -1.0


def q_l2g_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = q_l2g_features(spark, sf_dir)
    logit = (
        F.lit(L2G_B)
        + L2G_W["max_weight"] * F.col("max_weight")
        + L2G_W["rel_weight"] * F.col("rel_weight")
        + L2G_W["genes_in_flank"] * F.col("genes_in_flank")
    )
    score = 1.0 / (1.0 + F.exp(-logit))
    w = Window.partitionBy("point_id", "study_id").orderBy(
        F.col("l2g_score").desc(), F.col("gene_id").asc()
    )
    return (
        feats.withColumn("l2g_score", F.round(score, 6))
        .withColumn("gene_rank", F.row_number().over(w))
        .select("point_id", "study_id", "gene_id", "l2g_score", "gene_rank")
    )


L2G_SCORE_SQL = f"""
WITH feats AS ({L2G_FEAT_SQL}),
scored AS (
  SELECT point_id, study_id, gene_id,
    ROUND(1.0 / (1.0 + EXP(-({L2G_B!r} + {L2G_W['max_weight']!r} * max_weight
      + {L2G_W['rel_weight']!r} * rel_weight
      + {L2G_W['genes_in_flank']!r} * genes_in_flank))), 6) AS l2g_score
  FROM feats
)
SELECT point_id, study_id, gene_id, l2g_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY point_id, study_id
                          ORDER BY l2g_score DESC, gene_id) AS INT) AS gene_rank
FROM scored
"""


# --- study validation -----------------------------------------------------
def q_study_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose study is absent from the study index
    (customer keys as the index). Reference: study_locus.py:160
    ``validate_study`` — left join + QC flag, never a filter."""
    ss = sumstats(spark, sf_dir)
    idx = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("study_key")
    )
    joined = ss.join(
        F.broadcast(idx), ss.study_id == idx.study_key, how="left"
    )
    return joined.select(
        "point_id",
        "study_id",
        F.col("study_key").isNotNull().alias("study_valid"),
        F.when(F.col("study_key").isNull(), F.lit("MISSING_STUDY"))
        .otherwise(F.lit(""))
        .alias("qc_flag"),
    )


STUDY_VALIDATION_SQL = f"""
SELECT point_id, study_id,
       EXISTS (SELECT 1 FROM customer WHERE c_custkey = study_id) AS study_valid,
       CASE WHEN EXISTS (SELECT 1 FROM customer WHERE c_custkey = study_id)
            THEN '' ELSE 'MISSING_STUDY' END AS qc_flag
FROM ({SUMSTATS_SQL})
"""


# --- JSON props ingestion -------------------------------------------------
def q_props_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events JSON payload with malformed-row tolerance —
    the datasource-adapter ingestion surface (get_json_object returns
    NULL on malformed input; the flag quarantines instead of dropping)."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k"),
        k.isNotNull().alias("parse_ok"),
        F.coalesce((k % 10).cast("int"), F.lit(-1)).alias("k_bucket"),
    )


PROPS_JSON_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.k') AS INT) IS NOT NULL AS parse_ok,
       COALESCE(CAST(json_extract(props, '$.k') AS INT) % 10, -1) AS k_bucket
FROM events
"""


# --- contingency enrichment ----------------------------------------------
def q_enrichment_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-priority enrichment of finished status: 2×2 odds ratio
    + χ² test (via the χ²(1) survival kernel). The contingency build is
    one pass of conditional aggregation."""
    orders = read_table(spark, sf_dir, "orders")
    tagged = orders.select(
        "o_orderpriority", (F.col("o_orderstatus") == "F").alias("is_f")
    )
    per = tagged.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("is_f"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(~F.col("is_f"), 1).otherwise(0)).alias("b"),
    )
    tot = tagged.agg(
        F.sum(F.when(F.col("is_f"), 1).otherwise(0)).alias("tf"),
        F.sum(F.when(~F.col("is_f"), 1).otherwise(0)).alias("tn"),
    )
    j = per.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "a",
        "b",
        (F.col("tf") - F.col("a")).alias("c"),
        (F.col("tn") - F.col("b")).alias("d"),
    )
    # Contingency arithmetic in doubles: the denominator product of four
    # ~N-sized margins overflows int64 already at sf0.1-scale counts.
    a, b, c, d = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    n = a + b + c + d
    chi2 = (n * F.pow(a * d - b * c, 2)) / ((a + b) * (c + d) * (a + c) * (b + d))
    return j.select(
        "o_orderpriority",
        "a",
        "b",
        "c",
        "d",
        F.round((a * d) / (b * c), 6).alias("odds_ratio"),
        F.round(chi2, 6).alias("chi2"),
        F.round(chi2_sf_1df_col(chi2), 6).alias("p_value"),
    )


def _enrichment_sql() -> str:
    chi2 = (
        "((ad + bd + cd + dd) * POW(ad * dd - bd * cd, 2))"
        " / ((ad + bd) * (cd + dd) * (ad + cd) * (bd + dd))"
    )
    return f"""
WITH per AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS tf,
         CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM orders
),
j AS (
  SELECT o_orderpriority, a, b, tf - a AS c, tn - b AS d FROM per, tot
)
SELECT o_orderpriority, a, b, c, d,
       ROUND((ad * dd) / (bd * cd), 6) AS odds_ratio,
       ROUND({chi2}, 6) AS chi2,
       ROUND({chi2_sf_1df_sql(chi2)}, 6) AS p_value
FROM (SELECT *, CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
             CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd FROM j)
"""


REGISTRY: dict[str, QuerySpec] = {
    "v2g_distance": QuerySpec(q_v2g_distance, V2G_SQL),
    "l2g_feature_matrix": QuerySpec(q_l2g_features, L2G_FEAT_SQL),
    "l2g_score": QuerySpec(q_l2g_score, L2G_SCORE_SQL),
    "study_validation": QuerySpec(q_study_validation, STUDY_VALIDATION_SQL),
    "props_json_parse": QuerySpec(q_props_json_parse, PROPS_JSON_SQL),
    "enrichment_odds_ratio": QuerySpec(q_enrichment_odds_ratio, _enrichment_sql()),
}


# --- L2G gold standard ----------------------------------------------------
def q_l2g_gold_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive/negative training labels per (lead, gene).

    Reference: dataset/l2g_gold_standard.py — the nearest gene is the
    positive; other genes reachable from the locus are negatives;
    ambiguous loci (tied top weight) are excluded entirely.
    """
    v2g = q_v2g_distance(spark, sf_dir)
    per_pair = v2g.groupBy("point_id", "study_id", "gene_id").agg(
        F.max("v2g_weight").alias("w")
    )
    lead_w = Window.partitionBy("point_id", "study_id")
    ranked = per_pair.withColumn("top_w", F.max("w").over(lead_w)).withColumn(
        "n_at_top",
        F.sum(F.when(F.col("w") == F.col("top_w"), 1).otherwise(0)).over(lead_w),
    )
    return (
        ranked.filter(F.col("n_at_top") == 1)
        .select(
            "point_id",
            "study_id",
            "gene_id",
            F.when(F.col("w") == F.col("top_w"), F.lit("positive"))
            .otherwise(F.lit("negative"))
            .alias("label"),
        )
    )


L2G_GOLD_SQL = f"""
WITH v2g AS ({V2G_SQL}),
per_pair AS (
  SELECT point_id, study_id, gene_id, MAX(v2g_weight) AS w
  FROM v2g GROUP BY 1, 2, 3
),
with_top AS (
  SELECT *, MAX(w) OVER (PARTITION BY point_id, study_id) AS top_w
  FROM per_pair
),
ranked AS (
  SELECT *,
    SUM(CASE WHEN w = top_w THEN 1 ELSE 0 END)
      OVER (PARTITION BY point_id, study_id) AS n_at_top
  FROM with_top
)
SELECT point_id, study_id, gene_id,
       CASE WHEN w = top_w THEN 'positive' ELSE 'negative' END AS label
FROM ranked
WHERE n_at_top = 1
"""


REGISTRY["l2g_gold_standard"] = QuerySpec(q_l2g_gold_standard, L2G_GOLD_SQL)
