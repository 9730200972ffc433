"""Similarity search over embedding columns (SURVEY §2.E5, E6, E11).

Brute-force cosine top-k as the verifiable per-bucket kernel, plus
random-hyperplane LSH variants as the scale path for both ANN top-k
and embedding near-dup pairs. Vector math is unrolled arithmetic over
double-cast arrays — JVM-side, deterministic left-to-right
accumulation (matches DuckDB's sequential list_dot_product for oracle
parity).

Scale design (100 TB): candidate generation is always an equi-join on
(band, band_val) sign-pattern buckets; the only cross join left is
``cosine_topk``, whose contract is a BOUNDED query set broadcast
against the corpus (a linear corpus scan, not a cartesian product) —
it is also the within-bucket kernel of the LSH paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    # Native array cast (codegen) — NOT transform(x -> cast(x)), which
    # drops to interpreted higher-order-function evaluation per row.
    return vec.cast("array<double>")


def det_hyperplanes(n_planes: int = 3, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG dependency).

    Values are exact multiples of 1/500 so the decimal literals parse
    to identical doubles in Spark and DuckDB — the sign patterns (and
    therefore LSH buckets) are bit-identical across engines, which is
    what upgrades the LSH operators to full value-hash oracle checks.
    """
    planes = []
    for p in range(n_planes):
        planes.append(
            [(((i * 2654435761 + p * 40503) % 1000) / 500.0) - 1.0 for i in range(dim)]
        )
    return planes


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


def plane_dot(v: Column, plane: list[float]) -> Column:
    """Unrolled v·plane with literal weights (left-assoc from 0.0)."""
    out: Column = F.lit(0.0)
    for i, w in enumerate(plane):
        out = out + F.element_at(v, i + 1) * F.lit(w)
    return out


def sign_bits(v: Column, hyperplanes: list[list[float]]) -> list[Column]:
    """One 0/1 column per hyperplane: 1 iff v·plane >= 0."""
    return [
        F.when(plane_dot(v, hp) >= 0, F.lit(1)).otherwise(F.lit(0))
        for hp in hyperplanes
    ]


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
    """Brute-force cosine top-k for a BOUNDED query set.

    The query side is explicitly broadcast: the plan is a
    BroadcastNestedLoopJoin that scans the corpus ONCE and scores each
    row against the in-memory query vectors — linear in corpus size,
    which is the correct shape for "score a handful of probes against
    100 TB". It is NOT a corpus×corpus product; for all-pairs problems
    use ``lsh_dup_pairs``, and for large query sets use ``lsh_topk``.
    Ranking is per-query (row_number over the rounded similarity, ties
    broken by id) so the result is deterministic and oracle-comparable.
    """
    q = queries.select(F.col(query_id), as_double(F.col(vec)).alias("qv"))
    c = corpus.select(F.col(corpus_id), as_double(F.col(vec)).alias("cv"))
    scored = F.broadcast(q).crossJoin(c).withColumn(
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
    """Embedding-cosine near-duplicate pairs within explicit blocks.

    Kept as the *pre-blocked* kernel (e.g. per-language, per-shard
    dedup where a block key already exists and is high-cardinality).
    For unblocked corpora use ``lsh_dup_pairs`` — a low-cardinality
    block key here means O(Σ block²) pairs.
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


def lsh_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_planes: int = 16,
    bands: int = 2,
    min_cosine: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs blocked by banded sign-pattern LSH
    (SURVEY E11 — the scale path, r2 headline).

    Candidate generation: ``n_planes`` fixed hyperplanes give each
    vector a sign pattern, split into ``bands`` bands; two vectors are
    candidates iff they share ANY full band (equi-join on
    (band, band_val)). Pair space is O(Σ bucket²) with data-adaptive
    buckets — never a label-cardinality artifact. Verification re-joins
    the two vectors by id and thresholds the rounded cosine, so output
    pairs are exact (recall < 1 by LSH construction; both engines
    compute the identical candidate set, so the oracle matches).
    """
    hyperplanes = det_hyperplanes(n_planes, dim)
    bits_per_band = n_planes // bands
    base = df.select(F.col(id_col).alias("vid"), as_double(F.col(vec)).alias("v"))
    bits = sign_bits(F.col("v"), hyperplanes)
    band_structs = []
    for bd in range(bands):
        val: Column = F.lit(0)
        for i in range(bits_per_band):
            val = val + bits[bd * bits_per_band + i] * F.lit(2**i)
        band_structs.append(
            F.struct(F.lit(bd).alias("band"), val.alias("band_val"))
        )
    banded = base.select(
        "vid", F.explode(F.array(*band_structs)).alias("bb")
    ).select("vid", "bb.band", "bb.band_val")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "band_val"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb"), dim), 6))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "vec",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH ANN (SURVEY E6): bucket by sign pattern,
    brute-force cosine within bucket only.

    ``hyperplanes`` is a small literal list (generated deterministically
    by the caller) — it compiles into the plan, no broadcast needed.
    Recall < 1 by construction, but DETERMINISTIC: with
    ``det_hyperplanes`` both engines assign identical buckets, so the
    result is fully oracle-checkable.
    """

    def bucket_expr(v: Column) -> Column:
        bits = sign_bits(v, hyperplanes)
        out: Column = F.lit(0)
        for bi, bit in enumerate(bits):
            out = out + bit * F.lit(2**bi)
        return out

    q = queries.select(
        F.col(query_id), as_double(F.col(vec)).alias("qv")
    ).withColumn("bucket", bucket_expr(F.col("qv")))
    c = corpus.select(
        F.col(corpus_id), as_double(F.col(vec)).alias("cv")
    ).withColumn("bucket", bucket_expr(F.col("cv")))
    scored = q.join(c, on="bucket").withColumn(
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
