"""Extended L2G feature families (SURVEY §2.H — r4).

Completes the reference's locus-to-gene feature surface on the
synthetic tables. Three families, each oracle-checked and keyed by
(study_id, contig, cluster_seq, gene_id) — the credible-set locus:

- VEP family (dataset/l2g_features/vep.py): ``vep_max`` (max
  consequence severity over credible-set variants per gene, :131
  VepMaximumFeature), ``vep_mean`` (posterior-weighted mean severity,
  :206 VepMeanFeature), and their neighbourhood-normalized variants
  (:94 common_neighbourhood_vep_feature_logic — local value divided by
  the regional max over protein-coding genes at the locus).
- gene-structure family (dataset/l2g_features/other.py): gene counts
  within a TSS window of the lead (:151 GeneCountFeature, :191
  ProteinGeneCountFeature — exact COUNT DISTINCT where the reference
  uses approx_count_distinct: approximate counts are not
  cross-engine-reproducible and the exact count is partial-agg
  friendly anyway), a protein-coding indicator over footprint-reachable
  genes (:232 ProteinCodingFeature), and the credible-set confidence
  score (:272 CredibleSetConfidenceFeature with the :340 class→score
  when-cascade).
- interval/E2G family (dataset/l2g_features/intervals.py:55
  e2g_interval_feature_wide_logic_binned): per-variant max interval
  score, posterior-weighted sum per gene (``e2g_mean``), and the
  locus-mean-centred ratio (``e2g_mean_nbh``) — including the
  reference's own bin-accelerated overlap join (intervals exploded to
  grid bins, equi-join on (contig, bin), exact range filter).

``assemble_locus_features`` is the feature-factory counterpart of
method/l2g/feature_factory.py: full-outer combine of the families on
the locus-gene key with 0-fill, consumed by the extended
``l2g_feature_matrix`` in plans/l2g.py.

Cross-engine exactness: posterior×severity products are quantized to
≤9 decimal places before the DECIMAL(38,12) partial-agg sum (products
of already-rounded 6-dp posteriors with 2-dp severities / 3-dp interval
scores terminate well inside the cast scale); every ratio is truncated
(FLOOR(x·1e6)/1e6), never ROUND — quotients of rounded doubles land on
half-ties where the engines' ROUND disagree.

Scale notes: credible sets and leads are computed once and
track_cache'd per call; genes are broadcast; both range joins are grid
tile/bin equi-joins (never contig-wide products); every aggregation is
a hash groupBy on the locus-gene key — partial-agg friendly and
skew-free (locus keys are high-cardinality composites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.plans.synthmap import (
    BASE_US,
    GENE_SPACING_US,
    GENE_WIDTH_US,
    V2G_FLANK_US,
)

DEC12 = "decimal(38,12)"

# TSS window for the gene-count features — the "500kb" analog on the
# synthetic grid (±6h captures 1–3 genes, so counts vary).
GENE_COUNT_FLANK_US = 21_600_000_000
# Minimum posterior for a credible-set variant to contribute to the
# interval feature (reference default pp_min=0.001).
E2G_PP_MIN = 0.001
# CredibleSetConfidenceClasses → score (study_locus.py:40 enum order,
# other.py:340 when-cascade).
CONF_SCORES = (1.0, 0.75, 0.5, 0.25, 0.0)

_LOCUS_KEY = ["study_id", "contig", "cluster_seq"]
_FEAT_KEY = [*_LOCUS_KEY, "gene_id"]

# Gene biotype is deterministic on the synthetic grid: 3 of 4 genes
# are protein-coding (the target-index biotype column the reference
# filters on). Column built lazily — pyspark requires an active
# session for Column construction.
def _is_pc() -> F.Column:
    return F.col("gene_id") % 4 != 0


_IS_PC_SQL = "gene_id % 4 <> 0"


def _credset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credible-set variants: PICS members with a non-null posterior."""
    from gentropy_spark.plans.genomics import q_pics_finemap
    from gentropy_spark.session import track_cache

    return track_cache(
        q_pics_finemap(spark, sf_dir).filter(F.col("pics_pp").isNotNull())
    )


def _credset_sql() -> str:
    from gentropy_spark.plans.genomics import PICS_SQL

    return f"SELECT * FROM ({PICS_SQL}) WHERE pics_pp IS NOT NULL"


def _leads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gentropy_spark.plans.genomics import q_window_clump_leads
    from gentropy_spark.session import track_cache

    return track_cache(q_window_clump_leads(spark, sf_dir))


def _footprint_join(variants: DataFrame, genes: DataFrame) -> DataFrame:
    """Variants × genes within the footprint flank (grid tile equi-join)."""
    genes_k = genes.withColumn(
        "gk", F.expr(f"(gene_start - {BASE_US}) div {GENE_SPACING_US}")
    )
    k_hi = F.expr(f"(pos - {BASE_US} + {V2G_FLANK_US}) div {GENE_SPACING_US}")
    k_lo = F.expr(
        f"(pos - {BASE_US} - {GENE_WIDTH_US} - {V2G_FLANK_US}) div {GENE_SPACING_US}"
    )
    vars_k = variants.withColumn("gk", F.explode(F.sequence(k_lo, k_hi)))
    return vars_k.join(F.broadcast(genes_k), on=["contig", "gk"]).filter(
        (F.col("pos") >= F.col("gene_start") - V2G_FLANK_US)
        & (F.col("pos") <= F.col("gene_end") + V2G_FLANK_US)
    )


def _severity_col() -> F.Column:
    """Consequence severity of a (variant pos, gene) pair — the same
    term→score map as vep_consequence_annotate (plans/variants.py)."""
    from gentropy_spark.plans.variants import CONSEQUENCE_SEVERITY, EXON_GRID_US

    in_body = (F.col("pos") >= F.col("gene_start")) & (
        F.col("pos") <= F.col("gene_end")
    )
    in_exon = F.expr(f"((pos - gene_start) div {EXON_GRID_US}) % 2") == 0
    sev_map = dict(CONSEQUENCE_SEVERITY)
    return (
        F.when(in_body & in_exon, F.lit(sev_map["exon_variant"]))
        .when(in_body, F.lit(sev_map["intron_variant"]))
        .when(F.col("pos") < F.col("gene_start"), F.lit(sev_map["upstream_gene_variant"]))
        .otherwise(F.lit(sev_map["downstream_gene_variant"]))
    )


def _severity_sql() -> str:
    from gentropy_spark.plans.variants import CONSEQUENCE_SEVERITY, EXON_GRID_US

    sev_map = dict(CONSEQUENCE_SEVERITY)
    return (
        f"CASE WHEN pos >= gene_start AND pos <= gene_end "
        f"AND ((pos - gene_start) // {EXON_GRID_US}) % 2 = 0 "
        f"THEN {format(sev_map['exon_variant'], '.17e')} "
        f"WHEN pos >= gene_start AND pos <= gene_end "
        f"THEN {format(sev_map['intron_variant'], '.17e')} "
        f"WHEN pos < gene_start "
        f"THEN {format(sev_map['upstream_gene_variant'], '.17e')} "
        f"ELSE {format(sev_map['downstream_gene_variant'], '.17e')} END"
    )


def _trunc6(c: F.Column) -> F.Column:
    return F.floor(c * 1e6) / 1e6


# --- VEP feature family ----------------------------------------------------
def q_l2g_vep_features(
    spark: SparkSession,
    sf_dir: str,
    _fp: DataFrame | None = None,
) -> DataFrame:
    from gentropy_spark.plans.l2g import gene_index

    if _fp is None:
        _fp = _footprint_join(
            _credset(spark, sf_dir), gene_index(spark, sf_dir)
        )
    j = _fp.select(
        *_LOCUS_KEY, "gene_id", _severity_col().alias("severity"), "pics_pp"
    )
    local = j.groupBy(*_FEAT_KEY).agg(
        F.max("severity").alias("vep_max"),
        F.count("*").alias("n_v"),
        F.sum((F.col("severity") * F.col("pics_pp")).cast(DEC12))
        .cast("double")
        .alias("sum_ws"),
    )
    w_loc = Window.partitionBy(*_LOCUS_KEY)
    vep_mean = _trunc6(F.col("sum_ws") / F.col("n_v"))
    scored = local.select(
        *_FEAT_KEY, "vep_max", vep_mean.alias("vep_mean")
    )
    reg_max = F.max(F.when(_is_pc(), F.col("vep_max"))).over(w_loc)
    reg_mean = F.max(F.when(_is_pc(), F.col("vep_mean"))).over(w_loc)

    def nbh(local_c: F.Column, reg: F.Column) -> F.Column:
        return (
            F.when(_is_pc() & (reg > 0.0), _trunc6(local_c / reg))
            .otherwise(F.lit(0.0))
        )

    return scored.select(
        *_FEAT_KEY,
        "vep_max",
        "vep_mean",
        nbh(F.col("vep_max"), reg_max).alias("vep_max_nbh"),
        nbh(F.col("vep_mean"), reg_mean).alias("vep_mean_nbh"),
    )


def _vep_feat_sql() -> str:
    from gentropy_spark.plans.l2g import GENE_INDEX_SQL

    sev = _severity_sql()
    return f"""
WITH credset AS ({_credset_sql()}),
genes AS ({GENE_INDEX_SQL}),
j AS (
  SELECT c.study_id, c.contig, c.cluster_seq, g.gene_id,
         {sev} AS severity, c.pics_pp
  FROM credset c JOIN genes g ON c.contig = g.contig
  WHERE c.pos >= g.gene_start - {V2G_FLANK_US}
    AND c.pos <= g.gene_end + {V2G_FLANK_US}
),
local AS (
  SELECT study_id, contig, cluster_seq, gene_id,
         MAX(severity) AS vep_max,
         COUNT(*) AS n_v,
         CAST(SUM(CAST(severity * pics_pp AS DECIMAL(38,12))) AS DOUBLE) AS sum_ws
  FROM j GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT study_id, contig, cluster_seq, gene_id, vep_max,
         FLOOR(sum_ws / n_v * 1000000.0) / 1000000.0 AS vep_mean
  FROM local
),
with_reg AS (
  SELECT *,
    MAX(CASE WHEN {_IS_PC_SQL} THEN vep_max END)
      OVER (PARTITION BY study_id, contig, cluster_seq) AS reg_max,
    MAX(CASE WHEN {_IS_PC_SQL} THEN vep_mean END)
      OVER (PARTITION BY study_id, contig, cluster_seq) AS reg_mean
  FROM scored
)
SELECT study_id, contig, cluster_seq, gene_id, vep_max, vep_mean,
  CASE WHEN {_IS_PC_SQL} AND reg_max > 0.0
       THEN FLOOR(vep_max / reg_max * 1000000.0) / 1000000.0
       ELSE 0.0 END AS vep_max_nbh,
  CASE WHEN {_IS_PC_SQL} AND reg_mean > 0.0
       THEN FLOOR(vep_mean / reg_mean * 1000000.0) / 1000000.0
       ELSE 0.0 END AS vep_mean_nbh
FROM with_reg
"""


# --- gene-structure feature family ----------------------------------------
def q_l2g_gene_features(
    spark: SparkSession,
    sf_dir: str,
    _fp: DataFrame | None = None,
    _leads_df: DataFrame | None = None,
) -> DataFrame:
    from gentropy_spark.plans.l2g import gene_index

    leads = _leads_df if _leads_df is not None else _leads(spark, sf_dir)
    genes = gene_index(spark, sf_dir)
    # Genes with TSS (gene_start) inside the lead's count window.
    genes_k = genes.withColumn(
        "gk", F.expr(f"(gene_start - {BASE_US}) div {GENE_SPACING_US}")
    )
    k_hi = F.expr(
        f"(lead_pos - {BASE_US} + {GENE_COUNT_FLANK_US}) div {GENE_SPACING_US}"
    )
    k_lo = F.expr(
        f"(lead_pos - {BASE_US} - {GENE_COUNT_FLANK_US}) div {GENE_SPACING_US}"
    )
    leads_k = leads.withColumn("gk", F.explode(F.sequence(k_lo, k_hi)))
    tssj = leads_k.join(F.broadcast(genes_k), on=["contig", "gk"]).filter(
        (F.col("gene_start") >= F.col("lead_pos") - GENE_COUNT_FLANK_US)
        & (F.col("gene_start") <= F.col("lead_pos") + GENE_COUNT_FLANK_US)
    )
    counts = tssj.groupBy(*_LOCUS_KEY).agg(
        F.countDistinct("gene_id").alias("gene_count_w"),
        F.countDistinct(F.when(_is_pc(), F.col("gene_id"))).alias(
            "protein_gene_count_w"
        ),
    )
    tss_genes = (
        tssj.select(*_FEAT_KEY).distinct().join(counts, on=_LOCUS_KEY)
    )
    # Footprint-reachable genes: protein-coding flag + locus confidence.
    if _fp is None:
        _fp = _footprint_join(
            _credset(spark, sf_dir), gene_index(spark, sf_dir)
        )
    fp_genes = _fp.select(*_FEAT_KEY).distinct()
    conf_score = F.element_at(
        F.array(*[F.lit(s) for s in CONF_SCORES]),
        ((F.col("study_id") + F.col("cluster_seq")) % 5 + 1).cast("int"),
    )
    fp_feats = fp_genes.select(
        *_FEAT_KEY,
        F.when(_is_pc(), F.lit(1.0)).otherwise(F.lit(0.0)).alias(
            "is_protein_coding"
        ),
        conf_score.alias("credset_confidence"),
    )
    out = tss_genes.join(fp_feats, on=_FEAT_KEY, how="full")
    return out.select(
        *_FEAT_KEY,
        F.coalesce("gene_count_w", F.lit(0)).alias("gene_count_w"),
        F.coalesce("protein_gene_count_w", F.lit(0)).alias(
            "protein_gene_count_w"
        ),
        F.coalesce("is_protein_coding", F.lit(0.0)).alias("is_protein_coding"),
        F.coalesce("credset_confidence", F.lit(0.0)).alias(
            "credset_confidence"
        ),
    )


def _gene_feat_sql() -> str:
    from gentropy_spark.plans.genomics import WINDOW_CLUMP_SQL
    from gentropy_spark.plans.l2g import GENE_INDEX_SQL

    conf_arr = "[" + ", ".join(format(s, ".17e") for s in CONF_SCORES) + "]"
    return f"""
WITH leads AS ({WINDOW_CLUMP_SQL}),
genes AS ({GENE_INDEX_SQL}),
tssj AS (
  SELECT l.study_id, l.contig, l.cluster_seq, g.gene_id
  FROM leads l JOIN genes g ON l.contig = g.contig
  WHERE g.gene_start >= l.lead_pos - {GENE_COUNT_FLANK_US}
    AND g.gene_start <= l.lead_pos + {GENE_COUNT_FLANK_US}
),
counts AS (
  SELECT study_id, contig, cluster_seq,
         COUNT(DISTINCT gene_id) AS gene_count_w,
         COUNT(DISTINCT CASE WHEN {_IS_PC_SQL} THEN gene_id END)
           AS protein_gene_count_w
  FROM tssj GROUP BY 1, 2, 3
),
tss_genes AS (
  SELECT t.study_id, t.contig, t.cluster_seq, t.gene_id,
         c.gene_count_w, c.protein_gene_count_w
  FROM (SELECT DISTINCT * FROM tssj) t
  JOIN counts c USING (study_id, contig, cluster_seq)
),
credset AS ({_credset_sql()}),
fp_genes AS (
  SELECT DISTINCT c.study_id, c.contig, c.cluster_seq, g.gene_id
  FROM credset c JOIN genes g ON c.contig = g.contig
  WHERE c.pos >= g.gene_start - {V2G_FLANK_US}
    AND c.pos <= g.gene_end + {V2G_FLANK_US}
),
fp_feats AS (
  SELECT study_id, contig, cluster_seq, gene_id,
         CASE WHEN {_IS_PC_SQL} THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END
           AS is_protein_coding,
         ({conf_arr}::DOUBLE[])[CAST((study_id + cluster_seq) % 5 AS INT) + 1]
           AS credset_confidence
  FROM fp_genes
)
SELECT study_id, contig, cluster_seq, gene_id,
       COALESCE(gene_count_w, 0) AS gene_count_w,
       COALESCE(protein_gene_count_w, 0) AS protein_gene_count_w,
       COALESCE(is_protein_coding, 0.0) AS is_protein_coding,
       COALESCE(credset_confidence, 0.0) AS credset_confidence
FROM tss_genes
FULL JOIN fp_feats USING (study_id, contig, cluster_seq, gene_id)
"""


# --- interval / E2G feature family ----------------------------------------
def q_l2g_interval_features(
    spark: SparkSession,
    sf_dir: str,
    _cs: DataFrame | None = None,
) -> DataFrame:
    from gentropy_spark.plans.l2g import q_interval_evidence

    if _cs is None:
        _cs = _credset(spark, sf_dir)
    cs = _cs.filter(F.col("pics_pp") >= E2G_PP_MIN)
    iv = (
        q_interval_evidence(spark, sf_dir)
        .filter(F.col("is_valid"))
        .select(
            "contig",
            "istart",
            "iend",
            "gene_id",
            # 3-dp interval scores: pp(6dp)×score(3dp) products stay
            # ≤9 dp, safely inside the DECIMAL(38,12) quantization.
            (F.floor(F.col("score") * 1e3) / 1e3).alias("score3"),
        )
    )
    # Reference's bin-accelerated overlap: explode interval bins, bin
    # the variants, equi-join on (contig, bin), exact range filter.
    iv_b = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"(istart - {BASE_US}) div {GENE_SPACING_US}"),
                F.expr(f"(iend - {BASE_US}) div {GENE_SPACING_US}"),
            )
        ),
    )
    cs_b = cs.withColumn("bin", F.expr(f"(pos - {BASE_US}) div {GENE_SPACING_US}"))
    j = cs_b.join(iv_b, on=["contig", "bin"]).filter(
        (F.col("pos") >= F.col("istart")) & (F.col("pos") <= F.col("iend"))
    )
    # ONE exchange for the whole reduction ladder (r18): hash the
    # matched pairs on the locus prefix once — per_vg's 6-key groupBy,
    # the e2g feat-key groupBy and the locus window are all satisfied
    # by HashPartitioning(locus) (subset rule), collapsing three
    # exchanges to one. Trade (disclosed): the exchange carries the
    # raw (variant, interval) matches instead of per_vg partials — the
    # fan-in is the per-bin interval overlap count, a small domain
    # constant, on a credset-grain (not corpus-grain) table.
    per_vg = (
        j.repartition(*_LOCUS_KEY)
        .groupBy(*_LOCUS_KEY, "point_id", "pics_pp", "gene_id")
        .agg(F.max("score3").alias("vmax"))
    )
    e2g = per_vg.groupBy(*_FEAT_KEY).agg(
        F.sum((F.col("pics_pp") * F.col("vmax")).cast(DEC12))
        .cast("double")
        .alias("e2g_mean")
    )
    w_loc = Window.partitionBy(*_LOCUS_KEY)
    locus_mean = (
        F.sum(F.col("e2g_mean").cast(DEC12)).over(w_loc).cast("double")
        / F.count("*").over(w_loc)
    )
    return e2g.select(
        *_FEAT_KEY,
        "e2g_mean",
        F.when(locus_mean > 0.0, _trunc6(F.col("e2g_mean") / locus_mean))
        .otherwise(F.lit(0.0))
        .alias("e2g_mean_nbh"),
    )


def _interval_feat_sql() -> str:
    from gentropy_spark.plans.l2g import INTERVAL_EVIDENCE_SQL

    return f"""
WITH credset AS (
  SELECT * FROM ({_credset_sql()}) WHERE pics_pp >= {format(E2G_PP_MIN, '.17e')}
),
iv AS (
  SELECT contig, istart, iend, gene_id,
         FLOOR(score * 1000.0) / 1000.0 AS score3
  FROM ({INTERVAL_EVIDENCE_SQL}) WHERE is_valid
),
j AS (
  SELECT c.study_id, c.contig, c.cluster_seq, c.point_id, c.pics_pp,
         i.gene_id, i.score3
  FROM credset c JOIN iv i ON c.contig = i.contig
  WHERE c.pos >= i.istart AND c.pos <= i.iend
),
per_vg AS (
  SELECT study_id, contig, cluster_seq, point_id, pics_pp, gene_id,
         MAX(score3) AS vmax
  FROM j GROUP BY 1, 2, 3, 4, 5, 6
),
e2g AS (
  SELECT study_id, contig, cluster_seq, gene_id,
         CAST(SUM(CAST(pics_pp * vmax AS DECIMAL(38,12))) AS DOUBLE)
           AS e2g_mean
  FROM per_vg GROUP BY 1, 2, 3, 4
),
with_mean AS (
  SELECT *,
    CAST(SUM(CAST(e2g_mean AS DECIMAL(38,12)))
         OVER (PARTITION BY study_id, contig, cluster_seq) AS DOUBLE)
      / COUNT(*) OVER (PARTITION BY study_id, contig, cluster_seq)
      AS locus_mean
  FROM e2g
)
SELECT study_id, contig, cluster_seq, gene_id, e2g_mean,
  CASE WHEN locus_mean > 0.0
       THEN FLOOR(e2g_mean / locus_mean * 1000000.0) / 1000000.0
       ELSE 0.0 END AS e2g_mean_nbh
FROM with_mean
"""


# --- distance feature family ------------------------------------------------
# Reference: dataset/l2g_features/distance.py — the 8 named features
# mapped at method/l2g/feature_factory.py:110-117:
#   distanceSentinelTss           -> distance_sentinel_tss
#   distanceSentinelTssNeighbourhood -> distance_sentinel_tss_nbh
#   distanceSentinelFootprint     -> distance_sentinel_footprint
#   distanceSentinelFootprintNeighbourhood -> distance_sentinel_footprint_nbh
#   distanceTssMean               -> distance_tss_mean
#   distanceTssMeanNeighbourhood  -> distance_tss_mean_nbh
#   distanceFootprintMean         -> distance_footprint_mean
#   distanceFootprintMeanNeighbourhood -> distance_footprint_mean_nbh
# Semantics (distance.py:21-82 common_distance_feature_logic): score a
# (variant, gene) pair as (W - |d| + 1), posterior-weight and SUM over
# the credible set for Mean features, take the sentinel (lead) variant
# unweighted for Sentinel features, then log-scale by log10(W + 1).
# Mean features clamp < 0 to 0 (a posterior-weighted sum can land in
# (0, 1)); sentinel scores are >= 1 so their log is never negative —
# which is exactly why the reference only clamps the Mean classes.
# Neighbourhood variants (:85-141) divide the UNCLAMPED local value by
# the regional max over protein-coding genes at the locus, clamped to
# [0, 1]; non-protein-coding genes get 0 (the reference's inner join
# drops them; the wide matrix 0-fills).
# Distance types: distanceFromTss -> |pos - gene_start| (TSS = grid
# gene start); distanceFromFootprint -> 0 inside the gene body, else
# the gap to the nearer edge — the same expressions v2g_distance uses.
DIST_W_US = V2G_FLANK_US
# ONE shared python literal for log10(W + 1): computing it as an
# expression engine-side would be the float-literal parity trap.
_LOG10_W1 = 9.857332496491587

DIST_FEAT_COLS = [
    "distance_sentinel_tss",
    "distance_sentinel_tss_nbh",
    "distance_sentinel_footprint",
    "distance_sentinel_footprint_nbh",
    "distance_tss_mean",
    "distance_tss_mean_nbh",
    "distance_footprint_mean",
    "distance_footprint_mean_nbh",
]


def _d_fp() -> F.Column:
    return F.greatest(
        F.col("gene_start") - F.col("pos"),
        F.col("pos") - F.col("gene_end"),
        F.lit(0),
    )


def _d_tss() -> F.Column:
    return F.abs(F.col("pos") - F.col("gene_start"))


def _log_scale6(x: F.Column) -> F.Column:
    """log10(x) / log10(W+1), 6dp — null when x is null or <= 0."""
    return F.when(x > 0, F.round(F.log10(x) / _LOG10_W1, 6))


def _dist_locals(
    cs: DataFrame, leads: DataFrame, genes: DataFrame
) -> DataFrame:
    """Per (locus, gene): the four UNCLAMPED local distance features
    (6dp), union-agg combined — one shuffle on the locus-gene key."""
    # Mean half: posterior-weighted score sums over the credible set.
    fp = _footprint_join(cs, genes)
    score_fp = (F.lit(DIST_W_US) - _d_fp() + F.lit(1)) * F.col("pics_pp")
    score_tss = F.when(
        _d_tss() <= DIST_W_US,
        (F.lit(DIST_W_US) - _d_tss() + F.lit(1)) * F.col("pics_pp"),
    )
    mean_agg = fp.groupBy(*_FEAT_KEY).agg(
        F.sum(score_fp.cast(DEC12)).cast("double").alias("sum_fp"),
        F.sum(score_tss.cast(DEC12)).cast("double").alias("sum_tss"),
    )
    mean6 = mean_agg.select(
        *_FEAT_KEY,
        _log_scale6(F.col("sum_tss")).alias("tss_mean6"),
        _log_scale6(F.col("sum_fp")).alias("fp_mean6"),
    )
    # Sentinel half: unweighted lead-variant scores (>= 1, log >= 0).
    sent_src = leads.select(*_LOCUS_KEY, F.col("lead_pos").alias("pos"))
    sj = _footprint_join(sent_src, genes)
    sent = sj.select(
        *_FEAT_KEY,
        F.when(
            _d_tss() <= DIST_W_US,
            _log_scale6(F.lit(DIST_W_US) - _d_tss() + F.lit(1)),
        ).alias("sent_tss6"),
        _log_scale6(F.lit(DIST_W_US) - _d_fp() + F.lit(1)).alias("sent_fp6"),
    )
    local_cols = ["tss_mean6", "fp_mean6", "sent_tss6", "sent_fp6"]
    branches = [
        mean6.select(
            *_FEAT_KEY,
            "tss_mean6",
            "fp_mean6",
            F.lit(None).cast("double").alias("sent_tss6"),
            F.lit(None).cast("double").alias("sent_fp6"),
        ),
        sent.select(
            *_FEAT_KEY,
            F.lit(None).cast("double").alias("tss_mean6"),
            F.lit(None).cast("double").alias("fp_mean6"),
            "sent_tss6",
            "sent_fp6",
        ),
    ]
    return (
        branches[0]
        .unionByName(branches[1])
        .groupBy(*_FEAT_KEY)
        .agg(*[F.max(c).alias(c) for c in local_cols])
    )


def _dist_outputs(locals_df: DataFrame) -> DataFrame:
    """Clamp locals, compute neighbourhood ratios — one locus window."""
    w_loc = Window.partitionBy(*_LOCUS_KEY)

    def nbh(local6: str) -> F.Column:
        reg = F.max(F.when(_is_pc(), F.col(local6))).over(w_loc)
        ratio = _trunc6(F.col(local6) / reg)
        return (
            F.when(
                _is_pc()
                & F.col(local6).isNotNull()
                & reg.isNotNull()
                & (reg != 0.0),
                F.least(F.greatest(ratio, F.lit(0.0)), F.lit(1.0)),
            )
            .otherwise(F.lit(0.0))
        )

    def clamp0(local6: str) -> F.Column:
        return F.when(F.col(local6) < 0, F.lit(0.0)).otherwise(
            F.coalesce(F.col(local6), F.lit(0.0))
        )

    return locals_df.select(
        *_FEAT_KEY,
        F.coalesce(F.col("sent_tss6"), F.lit(0.0)).alias(
            "distance_sentinel_tss"
        ),
        nbh("sent_tss6").alias("distance_sentinel_tss_nbh"),
        F.coalesce(F.col("sent_fp6"), F.lit(0.0)).alias(
            "distance_sentinel_footprint"
        ),
        nbh("sent_fp6").alias("distance_sentinel_footprint_nbh"),
        clamp0("tss_mean6").alias("distance_tss_mean"),
        nbh("tss_mean6").alias("distance_tss_mean_nbh"),
        clamp0("fp_mean6").alias("distance_footprint_mean"),
        nbh("fp_mean6").alias("distance_footprint_mean_nbh"),
    )


def q_l2g_distance_features(
    spark: SparkSession,
    sf_dir: str,
    _cs: DataFrame | None = None,
    _leads_df: DataFrame | None = None,
) -> DataFrame:
    from gentropy_spark.plans.l2g import gene_index

    cs = _cs if _cs is not None else _credset(spark, sf_dir)
    leads = _leads_df if _leads_df is not None else _leads(spark, sf_dir)
    genes = gene_index(spark, sf_dir)
    return _dist_outputs(_dist_locals(cs, leads, genes))


def _dist_feat_sql() -> str:
    from gentropy_spark.plans.genomics import WINDOW_CLUMP_SQL
    from gentropy_spark.plans.l2g import GENE_INDEX_SQL

    W = DIST_W_US
    L = f"{_LOG10_W1!r}"
    d_fp = "GREATEST(gene_start - pos, pos - gene_end, 0)"
    d_tss = "ABS(pos - gene_start)"
    d_fp_l = "GREATEST(gene_start - lead_pos, lead_pos - gene_end, 0)"
    d_tss_l = "ABS(lead_pos - gene_start)"

    def nbh(local6: str) -> str:
        reg = (
            f"MAX(CASE WHEN {_IS_PC_SQL} THEN {local6} END) "
            f"OVER (PARTITION BY study_id, contig, cluster_seq)"
        )
        return (
            f"CASE WHEN {_IS_PC_SQL} AND {local6} IS NOT NULL "
            f"AND {reg} IS NOT NULL AND {reg} <> 0.0 "
            f"THEN LEAST(GREATEST("
            f"FLOOR({local6} / ({reg}) * 1000000.0) / 1000000.0, "
            f"0.0::DOUBLE), 1.0::DOUBLE) ELSE 0.0::DOUBLE END"
        )

    def clamp0(local6: str) -> str:
        return (
            f"CASE WHEN {local6} < 0 THEN 0.0::DOUBLE "
            f"ELSE COALESCE({local6}, 0.0::DOUBLE) END"
        )

    return f"""
WITH credset AS ({_credset_sql()}),
genes AS ({GENE_INDEX_SQL}),
fp AS (
  SELECT c.study_id, c.contig, c.cluster_seq, g.gene_id,
         c.pos, c.pics_pp, g.gene_start, g.gene_end
  FROM credset c JOIN genes g ON c.contig = g.contig
  WHERE c.pos >= g.gene_start - {W} AND c.pos <= g.gene_end + {W}
),
mean_agg AS (
  SELECT study_id, contig, cluster_seq, gene_id,
    CAST(SUM(CAST(({W} - {d_fp} + 1) * pics_pp AS DECIMAL(38,12)))
      AS DOUBLE) AS sum_fp,
    CAST(SUM(CAST(CASE WHEN {d_tss} <= {W}
      THEN ({W} - {d_tss} + 1) * pics_pp END AS DECIMAL(38,12)))
      AS DOUBLE) AS sum_tss
  FROM fp GROUP BY 1, 2, 3, 4
),
mean6 AS (
  SELECT study_id, contig, cluster_seq, gene_id,
    ROUND(LOG10(NULLIF(GREATEST(sum_tss, 0.0), 0.0)) / {L}, 6) AS tss_mean6,
    ROUND(LOG10(NULLIF(GREATEST(sum_fp, 0.0), 0.0)) / {L}, 6) AS fp_mean6
  FROM mean_agg
),
leads AS ({WINDOW_CLUMP_SQL}),
sent AS (
  SELECT l.study_id, l.contig, l.cluster_seq, g.gene_id,
    CASE WHEN {d_tss_l} <= {W}
      THEN ROUND(LOG10({W} - {d_tss_l} + 1) / {L}, 6) END AS sent_tss6,
    ROUND(LOG10({W} - {d_fp_l} + 1) / {L}, 6) AS sent_fp6
  FROM leads l JOIN genes g ON l.contig = g.contig
  WHERE l.lead_pos >= g.gene_start - {W} AND l.lead_pos <= g.gene_end + {W}
),
locals6 AS (
  SELECT study_id, contig, cluster_seq, gene_id,
         MAX(tss_mean6) AS tss_mean6, MAX(fp_mean6) AS fp_mean6,
         MAX(sent_tss6) AS sent_tss6, MAX(sent_fp6) AS sent_fp6
  FROM (
    SELECT *, NULL::DOUBLE AS sent_tss6, NULL::DOUBLE AS sent_fp6 FROM mean6
    UNION ALL BY NAME
    SELECT study_id, contig, cluster_seq, gene_id,
           NULL::DOUBLE AS tss_mean6, NULL::DOUBLE AS fp_mean6,
           sent_tss6, sent_fp6
    FROM sent
  ) GROUP BY 1, 2, 3, 4
)
SELECT study_id, contig, cluster_seq, gene_id,
  COALESCE(sent_tss6, 0.0::DOUBLE) AS distance_sentinel_tss,
  {nbh("sent_tss6")} AS distance_sentinel_tss_nbh,
  COALESCE(sent_fp6, 0.0::DOUBLE) AS distance_sentinel_footprint,
  {nbh("sent_fp6")} AS distance_sentinel_footprint_nbh,
  {clamp0("tss_mean6")} AS distance_tss_mean,
  {nbh("tss_mean6")} AS distance_tss_mean_nbh,
  {clamp0("fp_mean6")} AS distance_footprint_mean,
  {nbh("fp_mean6")} AS distance_footprint_mean_nbh
FROM locals6
"""


# --- feature factory -------------------------------------------------------
# Column groups each family contributes (0-fill defaults in the
# assembled output and in the extended feature matrix).
VEP_FEAT_COLS = ["vep_max", "vep_mean", "vep_max_nbh", "vep_mean_nbh"]
GENE_FEAT_COLS = [
    "gene_count_w",
    "protein_gene_count_w",
    "is_protein_coding",
    "credset_confidence",
]
E2G_FEAT_COLS = ["e2g_mean", "e2g_mean_nbh"]
EXT_FEAT_COLS = [
    *VEP_FEAT_COLS,
    *GENE_FEAT_COLS,
    *E2G_FEAT_COLS,
    *DIST_FEAT_COLS,
]
_INT_COLS = {"gene_count_w", "protein_gene_count_w"}


def _fp_family(fp: DataFrame) -> DataFrame:
    """VEP family + footprint gene features + distance-mean locals in
    ONE aggregation.

    ``q_l2g_vep_features``'s local aggregate, the gene family's
    footprint-distinct, and the distance family's posterior-weighted
    score sums (r11) all share the same (locus, gene) groupBy over the
    same footprint join — fused here so the assembled matrix pays one
    shuffle for all three (the standalone registry entries keep their
    separate shapes for the per-family oracles). The protein-coding
    flag and credible-set confidence are pure projections of the
    grouped key, so they ride the VEP aggregate for free.
    """
    score_fp = (F.lit(DIST_W_US) - _d_fp() + F.lit(1)) * F.col("pics_pp")
    score_tss = F.when(
        _d_tss() <= DIST_W_US,
        (F.lit(DIST_W_US) - _d_tss() + F.lit(1)) * F.col("pics_pp"),
    )
    j = fp.select(
        *_LOCUS_KEY,
        "gene_id",
        _severity_col().alias("severity"),
        "pics_pp",
        score_fp.alias("__score_fp"),
        score_tss.alias("__score_tss"),
    )
    local = j.groupBy(*_FEAT_KEY).agg(
        F.max("severity").alias("vep_max"),
        F.count("*").alias("n_v"),
        F.sum((F.col("severity") * F.col("pics_pp")).cast(DEC12))
        .cast("double")
        .alias("sum_ws"),
        F.sum(F.col("__score_fp").cast(DEC12)).cast("double").alias("sum_fp"),
        F.sum(F.col("__score_tss").cast(DEC12)).cast("double").alias("sum_tss"),
    )
    w_loc = Window.partitionBy(*_LOCUS_KEY)
    vep_mean = _trunc6(F.col("sum_ws") / F.col("n_v"))
    scored = local.select(
        *_FEAT_KEY, "vep_max", vep_mean.alias("vep_mean"), "sum_fp", "sum_tss"
    )
    reg_max = F.max(F.when(_is_pc(), F.col("vep_max"))).over(w_loc)
    reg_mean = F.max(F.when(_is_pc(), F.col("vep_mean"))).over(w_loc)

    def nbh(local_c: F.Column, reg: F.Column) -> F.Column:
        return (
            F.when(_is_pc() & (reg > 0.0), _trunc6(local_c / reg))
            .otherwise(F.lit(0.0))
        )

    conf_score = F.element_at(
        F.array(*[F.lit(s) for s in CONF_SCORES]),
        ((F.col("study_id") + F.col("cluster_seq")) % 5 + 1).cast("int"),
    )
    return scored.select(
        *_FEAT_KEY,
        "vep_max",
        "vep_mean",
        nbh(F.col("vep_max"), reg_max).alias("vep_max_nbh"),
        nbh(F.col("vep_mean"), reg_mean).alias("vep_mean_nbh"),
        F.when(_is_pc(), F.lit(1.0)).otherwise(F.lit(0.0)).alias(
            "is_protein_coding"
        ),
        conf_score.alias("credset_confidence"),
        # distance-mean locals (6dp log-scaled, UNCLAMPED — the clamp
        # and nbh ratio happen after assembly on one shared window)
        _log_scale6(F.col("sum_tss")).alias("tss_mean6"),
        _log_scale6(F.col("sum_fp")).alias("fp_mean6"),
    )


def _tss_counts(leads: DataFrame, genes: DataFrame) -> DataFrame:
    """TSS-window gene counts per (locus, gene) — the count half of the
    gene family, shaped as distinct-then-window (one exchange fewer
    than the standalone query's groupBy-join, identical values: after
    the per-pair distinct, the windowed row count IS the distinct gene
    count)."""
    genes_k = genes.withColumn(
        "gk", F.expr(f"(gene_start - {BASE_US}) div {GENE_SPACING_US}")
    )
    k_hi = F.expr(
        f"(lead_pos - {BASE_US} + {GENE_COUNT_FLANK_US}) div {GENE_SPACING_US}"
    )
    k_lo = F.expr(
        f"(lead_pos - {BASE_US} - {GENE_COUNT_FLANK_US}) div {GENE_SPACING_US}"
    )
    leads_k = leads.withColumn("gk", F.explode(F.sequence(k_lo, k_hi)))
    tssj = leads_k.join(F.broadcast(genes_k), on=["contig", "gk"]).filter(
        (F.col("gene_start") >= F.col("lead_pos") - GENE_COUNT_FLANK_US)
        & (F.col("gene_start") <= F.col("lead_pos") + GENE_COUNT_FLANK_US)
    )
    # ONE exchange for distinct + window (r18): hash on the 3-column
    # locus FIRST — HashPartitioning(locus) satisfies the 4-column
    # distinct's clustering (subset rule) AND the locus window, so both
    # run in the same stage instead of paying separate (feat-key,
    # locus) exchanges. Bytes are unchanged: tssj is already unique per
    # (locus, gene) — each gene matches its lead through exactly one
    # grid key — so the pre-distinct shuffle carries the same rows.
    per_g = tssj.select(*_FEAT_KEY).repartition(*_LOCUS_KEY).distinct()
    w_loc = Window.partitionBy(*_LOCUS_KEY)
    return per_g.select(
        *_FEAT_KEY,
        F.count("*").over(w_loc).alias("gene_count_w"),
        F.sum(_is_pc().cast("long")).over(w_loc).alias("protein_gene_count_w"),
    )


# Raw (UNCLAMPED) distance locals carried through the factory union;
# the clamp + neighbourhood ratios are computed after assembly on ONE
# shared locus window (vs the standalone distance query's own window).
_RAW_DIST_COLS = ["tss_mean6", "fp_mean6", "sent_tss6", "sent_fp6"]


def assemble_locus_features(
    spark: SparkSession,
    sf_dir: str,
    _leads_df: DataFrame | None = None,
) -> DataFrame:
    """Feature factory: combine the four families on the locus-gene
    key, 0-filled (method/l2g/feature_factory.py role).

    Shared subplans (PICS credible set, gene footprint join, clump
    leads, gene index) are constructed ONCE, cached, and threaded into
    every family. The combine is a UNION + one max-groupBy rather than
    a chain of full-outer joins: family keys are unique within each
    family and the feature columns are disjoint, so the union-agg is
    value-identical while paying ONE shuffle where the join chain paid
    two shuffle-joins (each re-exchanging both sides — the window
    outputs are partitioned on the 3-column locus, the join key is 4).

    The distance family (r11) is fused rather than appended: its
    posterior-weighted mean sums ride the footprint family's groupBy
    (same key, same join — zero extra exchanges), its sentinel half is
    a broadcast leads x genes join (zero exchanges), and all four
    neighbourhood ratios + clamps come from ONE locus window over the
    assembled matrix — where the standalone ``l2g_distance_features``
    query (kept for its per-family oracle) pays its own agg + window.
    """
    from gentropy_spark.plans.l2g import gene_index

    cs = _credset(spark, sf_dir)
    genes = gene_index(spark, sf_dir)
    # The footprint join is NOT persisted: with the r7 fusion it feeds
    # exactly ONE aggregation (the fused family below), and its inputs
    # are a cached credset + a broadcast gene dim — nothing to share.
    fp = _footprint_join(cs, genes)
    fused = _fp_family(fp)
    leads = _leads_df if _leads_df is not None else _leads(spark, sf_dir)
    tss = _tss_counts(leads, genes)
    e2g = q_l2g_interval_features(spark, sf_dir, _cs=cs)
    # Sentinel distance locals: lead variant x genes, broadcast join.
    sent_src = leads.select(*_LOCUS_KEY, F.col("lead_pos").alias("pos"))
    sent = _footprint_join(sent_src, genes).select(
        *_FEAT_KEY,
        F.when(
            _d_tss() <= DIST_W_US,
            _log_scale6(F.lit(DIST_W_US) - _d_tss() + F.lit(1)),
        ).alias("sent_tss6"),
        _log_scale6(F.lit(DIST_W_US) - _d_fp() + F.lit(1)).alias("sent_fp6"),
    )

    union_cols = [
        *VEP_FEAT_COLS,
        *GENE_FEAT_COLS,
        *E2G_FEAT_COLS,
        *_RAW_DIST_COLS,
    ]
    fam_own = (
        (
            fused,
            [
                *VEP_FEAT_COLS,
                "is_protein_coding",
                "credset_confidence",
                "tss_mean6",
                "fp_mean6",
            ],
        ),
        (tss, ["gene_count_w", "protein_gene_count_w"]),
        (e2g, E2G_FEAT_COLS),
        (sent, ["sent_tss6", "sent_fp6"]),
    )
    branches = []
    for df, own in fam_own:
        branches.append(
            df.select(
                *_FEAT_KEY,
                *[
                    F.col(c).alias(c)
                    if c in own
                    else F.lit(None)
                    .cast("long" if c in _INT_COLS else "double")
                    .alias(c)
                    for c in union_cols
                ],
            )
        )
    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.unionByName(b)
    # ONE exchange for combine + distance windows (r18): hash the
    # union on the locus prefix so the feat-key max-groupBy AND the
    # shared locus window below ride the same partitioning (subset
    # rule). The union rows are already family-aggregated (≤4 rows per
    # feat key), so the pre-combine shuffle is the same small table.
    agg = unioned.repartition(*_LOCUS_KEY).groupBy(*_FEAT_KEY).agg(
        *[F.max(c).alias(c) for c in union_cols]
    )

    # One shared locus window: the four distance nbh ratios + clamps
    # (identical expressions to _dist_outputs — pinned by the driver's
    # l2g_feature_matrix oracle and the per-family parity test).
    w_loc = Window.partitionBy(*_LOCUS_KEY)

    def nbh(local6: str) -> F.Column:
        reg = F.max(F.when(_is_pc(), F.col(local6))).over(w_loc)
        ratio = _trunc6(F.col(local6) / reg)
        return (
            F.when(
                _is_pc()
                & F.col(local6).isNotNull()
                & reg.isNotNull()
                & (reg != 0.0),
                F.least(F.greatest(ratio, F.lit(0.0)), F.lit(1.0)),
            )
            .otherwise(F.lit(0.0))
        )

    def clamp0(local6: str) -> F.Column:
        return F.when(F.col(local6) < 0, F.lit(0.0)).otherwise(
            F.coalesce(F.col(local6), F.lit(0.0))
        )

    dist_exprs = {
        "distance_sentinel_tss": F.coalesce(F.col("sent_tss6"), F.lit(0.0)),
        "distance_sentinel_tss_nbh": nbh("sent_tss6"),
        "distance_sentinel_footprint": F.coalesce(
            F.col("sent_fp6"), F.lit(0.0)
        ),
        "distance_sentinel_footprint_nbh": nbh("sent_fp6"),
        "distance_tss_mean": clamp0("tss_mean6"),
        "distance_tss_mean_nbh": nbh("tss_mean6"),
        "distance_footprint_mean": clamp0("fp_mean6"),
        "distance_footprint_mean_nbh": nbh("fp_mean6"),
    }
    return agg.select(
        *_FEAT_KEY,
        *[
            dist_exprs[c].alias(c)
            if c in dist_exprs
            else F.coalesce(
                F.col(c), F.lit(0) if c in _INT_COLS else F.lit(0.0)
            ).alias(c)
            for c in EXT_FEAT_COLS
        ],
    )


def _assemble_sql() -> str:
    cols = ",\n       ".join(
        f"COALESCE({c}, {'0' if c in _INT_COLS else '0.0'}) AS {c}"
        for c in EXT_FEAT_COLS
    )
    return f"""
WITH vep_f AS ({_vep_feat_sql()}),
gene_f AS ({_gene_feat_sql()}),
e2g_f AS ({_interval_feat_sql()}),
dist_f AS ({_dist_feat_sql()})
SELECT study_id, contig, cluster_seq, gene_id,
       {cols}
FROM vep_f
FULL JOIN gene_f USING (study_id, contig, cluster_seq, gene_id)
FULL JOIN e2g_f USING (study_id, contig, cluster_seq, gene_id)
FULL JOIN dist_f USING (study_id, contig, cluster_seq, gene_id)
"""


REGISTRY: dict[str, QuerySpec] = {
    "l2g_vep_features": QuerySpec(q_l2g_vep_features, _vep_feat_sql()),
    "l2g_gene_features": QuerySpec(q_l2g_gene_features, _gene_feat_sql()),
    "l2g_interval_features": QuerySpec(
        q_l2g_interval_features, _interval_feat_sql()
    ),
    "l2g_distance_features": QuerySpec(
        q_l2g_distance_features, _dist_feat_sql()
    ),
}
