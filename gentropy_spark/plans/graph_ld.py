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
