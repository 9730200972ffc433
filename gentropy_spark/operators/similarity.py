"""Similarity search over embedding columns (SURVEY §2.E5, E6, E11).

Brute-force cosine top-k as the verifiable baseline, plus a
random-hyperplane LSH-bucketed variant as the scale path. Vector math
is pure `F.aggregate`/`F.zip_with` fold over double-cast arrays —
JVM-side, deterministic left-to-right accumulation (matches DuckDB's
sequential list_dot_product for oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    # Native array cast (codegen) — NOT transform(x -> cast(x)), which
    # drops to interpreted higher-order-function evaluation per row.
    return vec.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Left-to-right dot product over double arrays.

    When ``dim`` is known, unroll into explicit arithmetic: Spark's
    higher-order functions (aggregate/zip_with) evaluate INTERPRETED
    per row (no whole-stage codegen) — the unrolled form is ~10x
    faster and numerically identical (left-associated addition, and
    IEEE 0.0+x == x for the fold's seed).
    """
    if dim is not None:
        terms = [
            F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """dot/(‖a‖·‖b‖) with norms as sqrt of self-dot (mirrors the oracle)."""
    return dot(a, b, dim) / (F.sqrt(dot(a, a, dim)) * F.sqrt(dot(b, b, dim)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "vec",
    dim: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against the corpus.

    The corpus side is broadcast when small; ranking is per-query
    (row_number over the rounded similarity, ties broken by id) so the
    result is deterministic and oracle-comparable.

    Scale: for large corpora this is the per-bucket kernel of
    ``lsh_topk`` — never run globally at 100 TB.
    """
    q = queries.select(F.col(query_id), as_double(F.col(vec)).alias("qv"))
    c = corpus.select(F.col(corpus_id), as_double(F.col(vec)).alias("cv"))
    scored = q.crossJoin(c).withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv"), dim), 6)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    block_col: str | None = "label",
    min_cosine: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (SURVEY E11).

    Blocking (here: the label column; at scale an LSH bucket) keeps
    the pair space linear-ish. Threshold applied to the rounded value
    so both engines make identical keep/drop decisions.
    """
    cols = [F.col(id_col), as_double(F.col(vec)).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("block"))
    base = df.select(*cols)
    a = base.select(
        *(["block"] if block_col else []),
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
    )
    b = base.select(
        *(["block"] if block_col else []),
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
    )
    join_keys = ["block"] if block_col else []
    pairs = (
        a.join(b, on=join_keys) if join_keys else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb"), dim), 6))
        .filter(F.col("cosine") >= min_cosine)
        .select(*(["block"] if block_col else []), "id_a", "id_b", "cosine")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "vec",
) -> DataFrame:
    """Random-hyperplane LSH ANN (SURVEY E6): bucket by sign pattern,
    brute-force cosine within bucket only.

    ``hyperplanes`` is a small literal list (generated deterministically
    by the caller) — it compiles into the plan, no broadcast needed.
    Recall < 1 by construction; this is the scale path, verified
    rows-only against the brute-force baseline in tests.
    """

    def bucket_expr(v: Column) -> Column:
        bits = [
            F.when(
                sum((F.element_at(v, i + 1) * w for i, w in enumerate(hp)), F.lit(0.0))
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            * (2**bi)
            for bi, hp in enumerate(hyperplanes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    q = queries.select(
        F.col(query_id), as_double(F.col(vec)).alias("qv")
    ).withColumn("bucket", bucket_expr(F.col("qv")))
    c = corpus.select(
        F.col(corpus_id), as_double(F.col(vec)).alias("cv")
    ).withColumn("bucket", bucket_expr(F.col("cv")))
    scored = q.join(c, on="bucket").withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
