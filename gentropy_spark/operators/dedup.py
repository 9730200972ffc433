"""Deduplication operators (SURVEY §2.E1–E4, E11).

Exact, fingerprint, shingle-Jaccard, MinHash-LSH and SimHash
deduplication as DataFrame transforms. All candidate generation is
join-based (never a cross join): the only O(n²) work is within a
candidate bucket, which is the standard scale posture for 100 TB
dedup (cf. MinHash banding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gentropy_spark.functions.text import tokens


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-group exact duplicates; keeper = lowest id per group."""
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("group_n", F.count("*").over(w))
        .withColumn("keeper_id", F.min(id_col).over(w))
        .select(
            F.col(id_col),
            "content_hash",
            "group_n",
            (F.col(id_col) == F.col("keeper_id")).alias("is_keeper"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (one row per shingle).

    The token array is materialised in its own projection BEFORE the
    gram builder references it: inlining ``tokens(text)`` into every
    ``element_at`` would re-run the whole regex tokenization per gram
    element (observed 30x slowdown). Per-doc dedup uses array_distinct
    in-place — no shuffle, unlike a global ``.distinct()``.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    # Guard: Spark's sequence(0, -1) would generate a DESCENDING range,
    # so short documents must map to an empty shingle list explicitly.
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def rare_shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int = 10,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Near-duplicate pairs by Jaccard over *rare* shingles.

    Shingles occurring in more than ``max_df`` documents are dropped
    before pair generation — this bounds candidate fan-out (the
    frequent-shingle cross-product is what kills naive Jaccard at
    scale) and is the deterministic, SQL-expressible counterpart of
    MinHash candidate pruning. Jaccard is computed over the rare
    shingle sets: |A∩B| / (|A|+|B|−|A∩B|).
    """
    # The shingle index is reused by the df-filter, the pair join (twice)
    # and the size lookup — persist it once instead of re-running the
    # tokenize→explode→distinct pipeline four times. At cluster scale
    # this materialisation is the bucketed shingle-index table a real
    # dedup pipeline would write anyway.
    sh = shingles(df, text_col, id_col, n).persist()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df_count"))
        .filter(F.col("df_count") <= max_df)
        .select("shingle")
    )
    rare_sh = sh.join(rare, on="shingle", how="inner").persist()
    sizes = rare_sh.groupBy(id_col).agg(F.count("*").alias("set_size"))

    a = rare_sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = rare_sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("set_size", "size_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("set_size", "size_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate candidate pairs (SURVEY E3).

    Signature: per doc, num_hashes minima of xxhash64(shingle, seed).
    Banding: rows/band = num_hashes//bands; docs sharing any band
    bucket become candidates; candidates are verified with the exact
    rare-free Jaccard over full shingle sets.

    Scale: shuffle is bounded by (docs × bands) bucket rows + the
    candidate verification join; no cross join anywhere.
    """
    rows_per_band = num_hashes // bands
    # Persist: the shingle index feeds the signature agg AND the
    # verification join (twice).
    sh = shingles(df, text_col, id_col, n).persist()
    sig = sh.groupBy(id_col).agg(
        F.array(
            *[
                F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(f"h{seed}")
                for seed in range(num_hashes)
            ]
        ).alias("sig")
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                "_",
                                *[
                                    F.element_at("sig", band * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    banded = banded.persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )

    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .join(cand, on=["id_a", "id_b"], how="leftsemi")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("set_size", "size_a"),
            on="id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("set_size", "size_b"),
            on="id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document (SURVEY E4).

    Per token t with 64-bit hash h: each bit contributes +1/−1 to a
    per-bit counter; the sign vector is the fingerprint. Expressed as
    an explode + groupBy (bit, sign-sum) aggregation — fully
    distributed, no UDFs.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    hashed = tok.withColumn("h", F.xxhash64("tok"))
    # Bit positions are compile-time constants — unroll to keep
    # shiftright on the fast literal path.
    bits_df = hashed.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bit"),
                        F.when(
                            F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, F.lit(1)
                        )
                        .otherwise(F.lit(-1))
                        .alias("delta"),
                    )
                    for i in range(bits)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "bd.bit", "bd.delta")
    return (
        bits_df.groupBy(id_col, "bit")
        .agg(F.sum("delta").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
