"""Iterative graph operators (SURVEY §2 — ontology/index support).

Re-expresses the reference's ontology ancestor expansion
(/root/reference/src/gentropy/dataset/biosample_index.py — ancestor /
descendant closure over the biosample ontology) as a distributed BFS:
repeated equi-joins of the frontier against the edge table until the
frontier drains. Each iteration is one shuffle on the join key; depth
is bounded by the ontology height (log-scale), so the loop count is
small and the per-iteration work is fully distributed — the standard
Spark pattern for transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 20,
) -> DataFrame:
    """All (child, ancestor, depth) pairs reachable through the edges.

    ``edges`` must be acyclic (ontologies are). The edge table is
    reused every iteration — persist it once.
    """
    edges = edges.select(child, parent).persist()
    closure = edges.select(
        F.col(child), F.col(parent).alias("ancestor"), F.lit(1).alias("depth")
    )
    frontier = closure
    for _ in range(max_depth):
        nxt = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.ancestor") == F.col(f"e.{child}"))
            .select(
                F.col(f"f.{child}"),
                F.col(f"e.{parent}").alias("ancestor"),
                (F.col("f.depth") + 1).alias("depth"),
            )
        )
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    return closure
