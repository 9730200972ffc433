"""Ontology closure + pairwise LD queries (SURVEY §2 extras).

- ontology_closure: ancestor closure of a deterministic part-keyed
  tree via iterative distributed BFS (biosample_index.py analog);
  oracle is a recursive CTE.
- pairwise_ld: bounded-span pairwise LD table within (study, contig)
  (dataset/pairwise_ld.py: upper-triangular r matrix per region).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gentropy_spark.operators.graph import transitive_closure
from gentropy_spark.plans.genomics import SUMSTATS_SQL, sumstats
from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.sources.readers import read_table


# --- ontology ancestor closure -------------------------------------------
def q_ontology_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree edges: parent(k) = k div 3 (valid while 1 <= parent < k)."""
    part = read_table(spark, sf_dir, "part")
    edges = part.select(
        F.col("p_partkey").alias("child"),
        F.expr("p_partkey div 3").alias("parent"),
    ).filter((F.col("parent") >= 1) & (F.col("parent") < F.col("child")))
    return transitive_closure(edges)


ONTOLOGY_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS child, p_partkey // 3 AS parent
  FROM part
  WHERE p_partkey // 3 >= 1 AND p_partkey // 3 < p_partkey
),
closure(child, ancestor, depth) AS (
  SELECT child, parent, 1 FROM edges
  UNION ALL
  SELECT c.child, e.parent, c.depth + 1
  FROM closure c JOIN edges e ON c.ancestor = e.child
)
SELECT child, ancestor, CAST(depth AS INT) AS depth FROM closure
"""


# --- pairwise LD table ----------------------------------------------------
LD_TAU_US = 10_800_000_000.0
LD_SPAN_US = 21_600_000_000  # only emit pairs within 6 h


def q_pairwise_ld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular pairwise LD within (study, contig), bounded span.

    Reference: dataset/pairwise_ld.py (square r matrix per region;
    here the sparse bounded-distance form a 100 TB run would store).
    """
    ss = sumstats(spark, sf_dir).filter(F.col("signif") >= 100.0)
    a = ss.alias("a")
    b = ss.select(
        F.col("study_id").alias("b_study"),
        F.col("contig").alias("b_contig"),
        F.col("pos").alias("b_pos"),
        F.col("point_id").alias("b_id"),
    )
    pairs = a.join(
        b,
        (F.col("a.study_id") == F.col("b_study"))
        & (F.col("a.contig") == F.col("b_contig"))
        & (F.col("a.point_id") < F.col("b_id"))
        & (F.abs(F.col("a.pos") - F.col("b_pos")) <= LD_SPAN_US),
    )
    r = F.exp(-F.abs(F.col("a.pos") - F.col("b_pos")) / F.lit(LD_TAU_US))
    return pairs.select(
        F.col("a.study_id").alias("study_id"),
        F.col("a.contig").alias("contig"),
        F.col("a.point_id").alias("id_a"),
        F.col("b_id").alias("id_b"),
        F.round(r, 6).alias("r"),
        F.round(r * r, 6).alias("r2"),
    )


PAIRWISE_LD_SQL = f"""
SELECT a.study_id, a.contig, a.point_id AS id_a, b.point_id AS id_b,
       ROUND(EXP(-ABS(a.pos - b.pos) / {LD_TAU_US!r}), 6) AS r,
       ROUND(EXP(-ABS(a.pos - b.pos) / {LD_TAU_US!r})
             * EXP(-ABS(a.pos - b.pos) / {LD_TAU_US!r}), 6) AS r2
FROM ({SUMSTATS_SQL}) a
JOIN ({SUMSTATS_SQL}) b
  ON a.study_id = b.study_id AND a.contig = b.contig
 AND a.point_id < b.point_id AND ABS(a.pos - b.pos) <= {LD_SPAN_US}
WHERE a.signif >= 100.0 AND b.signif >= 100.0
"""


REGISTRY: dict[str, QuerySpec] = {
    "ontology_closure": QuerySpec(q_ontology_closure, ONTOLOGY_SQL),
    "pairwise_ld": QuerySpec(q_pairwise_ld, PAIRWISE_LD_SQL),
}


# --- LD block-matrix slice (gnomAD LD posture) ----------------------------
LD_BLOCK_BAND = 5  # banded synthetic entries: |i-j| <= band
LD_BLOCK_LO, LD_BLOCK_HI = 10, 60  # slice window [lo, hi]


def q_ld_block_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-matrix pipeline: banded upper-triangular entries →
    symmetric transpose → square index-window slice → variant-id
    resolution (gnomad/ld.py:101/:223/:364/:200 composed).

    The locus index is the ranked variant list of one contig; entries
    are a banded synthetic r decay — the pipeline shape (not the r
    values) is what the reference computes over Hail block matrices.
    """
    from pyspark.sql import Window

    from gentropy_spark.operators.ld_matrix import (
        ld_block_slice,
        resolve_variant_indices,
        transpose_ld_triangular,
    )

    ss = sumstats(spark, sf_dir).filter(
        (F.col("contig") == "click") & (F.col("signif") >= 150.0)
    )
    w = Window.partitionBy("contig").orderBy("pos", "point_id")
    idx = ss.select(
        F.col("point_id").alias("variant_id"),
        (F.row_number().over(w) - 1).alias("idx"),
    )
    a = idx.select(F.col("idx").alias("idx_i"))
    b = idx.select(F.col("idx").alias("idx_j"))
    tri = (
        a.join(
            b,
            (F.col("idx_j") >= F.col("idx_i"))
            & (F.col("idx_j") - F.col("idx_i") <= LD_BLOCK_BAND),
        )
        .withColumn(
            "r",
            F.round(
                F.exp(-(F.col("idx_j") - F.col("idx_i")) / F.lit(float(LD_BLOCK_BAND))),
                6,
            ),
        )
    )
    sym = transpose_ld_triangular(tri)
    sliced = ld_block_slice(sym, LD_BLOCK_LO, LD_BLOCK_HI)
    return resolve_variant_indices(sliced, idx).select(
        "idx_i", "idx_j", "variant_id_a", "variant_id_b", "r"
    )


LD_BLOCK_SQL = f"""
WITH ranked AS (
  SELECT point_id AS variant_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY contig ORDER BY pos, point_id) - 1
              AS INT) AS idx
  FROM ({SUMSTATS_SQL})
  WHERE contig = 'click' AND signif >= 150.0
),
tri AS (
  SELECT a.idx AS idx_i, b.idx AS idx_j,
         ROUND(EXP(-(b.idx - a.idx) / {float(LD_BLOCK_BAND)!r}), 6) AS r
  FROM ranked a JOIN ranked b
    ON b.idx >= a.idx AND b.idx - a.idx <= {LD_BLOCK_BAND}
),
sym AS (
  SELECT idx_i, idx_j, r FROM tri
  UNION ALL
  SELECT idx_j AS idx_i, idx_i AS idx_j, r FROM tri WHERE idx_i <> idx_j
),
sliced AS (
  SELECT * FROM sym
  WHERE idx_i BETWEEN {LD_BLOCK_LO} AND {LD_BLOCK_HI}
    AND idx_j BETWEEN {LD_BLOCK_LO} AND {LD_BLOCK_HI}
)
SELECT idx_i, idx_j,
       ia.variant_id AS variant_id_a, ib.variant_id AS variant_id_b, r
FROM sliced
JOIN ranked ia ON ia.idx = idx_i
JOIN ranked ib ON ib.idx = idx_j
"""


REGISTRY["ld_block_slice"] = QuerySpec(q_ld_block_slice, LD_BLOCK_SQL)
