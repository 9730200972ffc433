"""Round-18 optimization pins.

Each test pins an internals change made for performance in the r18
optimization round to the exact values (or behaviour) it must
preserve. See OPTIMIZATION_r18.md for the measurements that motivated
each change.
"""

from __future__ import annotations

import pyspark.sql.functions as F


# --- plan-memo cache re-registration (r17 advisory) -------------------------
# A memoized plan builder is not re-invoked on a memo hit, so after
# release_caches() its multi-consumer persist marks were gone and every
# consumer recomputed the subtree (measured live: corpus_curate_scored
# 54.9s -> 13.5s in the same bench window once fixed). The memo now
# stores the build's track_cache handles and re-registers them on hit.
def test_plan_memo_repersists_tracked_caches_after_release(spark, sf_dir):
    from gentropy_spark import session as S
    from gentropy_spark.plans import full_registry
    from gentropy_spark.plans.registry import _PLAN_CACHE_KEYS

    assert "embedding_pca_power" in _PLAN_CACHE_KEYS
    fn = full_registry()["embedding_pca_power"].fn
    fn(spark, sf_dir)  # first build populates the memo + persists
    key = next(
        k
        for k in __import__(
            "gentropy_spark.plans.registry", fromlist=["_PLAN_MEMO"]
        )._PLAN_MEMO
        if k[2] == "embedding_pca_power"
    )
    from gentropy_spark.plans.registry import _PLAN_MEMO

    _df, tracked = _PLAN_MEMO[key]
    assert tracked, "build registered no track_cache handles"
    S.release_caches()
    for t in tracked:
        lvl = t.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), "release did not sweep"
    fn(spark, sf_dir)  # memo HIT must re-register the persist marks
    for t in tracked:
        lvl = t.storageLevel
        assert lvl.useMemory or lvl.useDisk, (
            "memo hit did not re-persist the tracked subtree"
        )
    S.release_caches()


def test_pairs_prepared_repersists_after_release(spark, sf_dir):
    from gentropy_spark import session as S
    from gentropy_spark.plans.llm_pipeline import (
        _PAIRS_PLAN_MEMO,
        minhash_pairs_prepared,
    )

    minhash_pairs_prepared(spark, sf_dir)
    key = next(
        k
        for k in _PAIRS_PLAN_MEMO
        if k[1] == sf_dir and k[2] == "minhash_pairs"
    )
    _df, tracked = _PAIRS_PLAN_MEMO[key]
    assert tracked
    S.release_caches()
    minhash_pairs_prepared(spark, sf_dir)
    assert all(
        t.storageLevel.useMemory or t.storageLevel.useDisk for t in tracked
    )
    S.release_caches()


# --- codegen stopword count / tokens() --------------------------------------
# tokens() and the stopword scores moved from CodegenFallback HOF
# lambdas (filter / aggregate) to natively code-generated expressions
# (array_remove / array_join). The values must be identical, including
# NULL and empty inputs and duplicate tokens.
def test_tokens_array_remove_matches_filter_lambda(spark):
    from gentropy_spark.functions.text import tokens

    df = spark.createDataFrame(
        [
            (1, "The cat, the hat & THE bat!"),
            (2, ""),
            (3, None),
            (4, "   ,,;;   "),
            (5, "a1b2 c3---d4 EEE"),
        ],
        "id long, text string",
    )
    old = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    rows = df.select(
        "id", tokens(F.col("text")).alias("new"), old.alias("old")
    ).collect()
    for r in rows:
        assert r["new"] == r["old"], (r["id"], r["new"], r["old"])


def test_stopword_count_sql_matches_filter_reference(spark):
    from gentropy_spark.functions.text import STOPWORDS, stopword_count_sql

    df = spark.createDataFrame(
        [
            (1, ["the", "the", "of", "cat", "el", "the"]),
            (2, []),
            (3, None),
            (4, ["zzz"]),
            (5, ["don't", "l'", "the"]),  # quote-bearing tokens
        ],
        "id long, toks array<string>",
    )
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        old = F.size(
            F.filter(F.col("toks"), lambda x: F.array_contains(arr, x))
        )
        new = F.expr(stopword_count_sql("toks", words))
        rows = df.select("id", new.alias("new"), old.alias("old")).collect()
        for r in rows:
            assert r["new"] == r["old"], (lang, r["id"], r["new"], r["old"])


def test_stopword_count_sql_escapes_quotes(spark):
    from gentropy_spark.functions.text import stopword_count_sql

    df = spark.createDataFrame(
        [(1, ["don't", "x", "don't"])], "id long, toks array<string>"
    )
    got = df.select(
        F.expr(stopword_count_sql("toks", ["don't"])).alias("n")
    ).collect()[0]["n"]
    assert got == 2


# --- gwas_study_ingest: fused sample-count projection ------------------------
# n_cases / n_controls / n_samples moved from parse_sample_counts's
# explode_outer -> groupBy -> self-left-join (a second full orders scan
# + a study-keyed exchange) to per-row array expressions. The study
# table is study-grain unique, so the per-row fold must equal the
# grouped sums on every edge case the parser handles.
def test_gwas_sample_counts_projection_matches_reference(spark):
    from gentropy_spark.plans.studies import parse_sample_counts

    cases = [
        (1, "1,000 cases, 2,500 controls"),
        (2, "5000 individuals"),
        (3, None),
        (4, "no digits here"),
        (5, "300 cases"),
        (6, "12 controls, 34 controls, 5 cases"),
        (7, ""),
        (8, "cases, controls"),  # words, no numbers
    ]
    df = spark.createDataFrame(cases, "study_id long, initial_sample_size string")
    ref = {
        r["study_id"]: (r["n_cases"], r["n_controls"], r["n_samples"])
        for r in parse_sample_counts(df).collect()
    }
    # the fused projection, reproduced exactly as q_gwas_study_ingest
    # builds it
    parts = F.split(F.col("initial_sample_size"), r",\s+")
    nums = F.transform(
        parts,
        lambda s: F.regexp_extract(
            F.regexp_replace(s, ",", ""), "[0-9]+", 0
        ).try_cast("long"),
    )
    tagged = F.zip_with(
        parts, nums, lambda s, n: F.struct(s.alias("s"), n.alias("n"))
    )

    def side_sum(substr):
        return F.coalesce(
            F.aggregate(
                tagged,
                F.lit(0).cast("long"),
                lambda acc, x: acc
                + F.coalesce(
                    F.when(x["s"].contains(substr), x["n"]),
                    F.lit(0).cast("long"),
                ),
            ),
            F.lit(0).cast("long"),
        )

    valid = F.filter(nums, lambda n: n.isNotNull())
    n_samples = F.when(
        valid.isNotNull() & (F.size(valid) > 0),
        F.aggregate(valid, F.lit(0).cast("long"), lambda a, x: a + x),
    )
    got = {
        r["study_id"]: (r["n_cases"], r["n_controls"], r["n_samples"])
        for r in df.select(
            "study_id",
            side_sum("cases").alias("n_cases"),
            side_sum("controls").alias("n_controls"),
            n_samples.alias("n_samples"),
        ).collect()
    }
    assert got == ref, {k: (got[k], ref[k]) for k in got if got[k] != ref[k]}


# --- subset-partitioning exchange sharing ------------------------------------
# The locus-prefix repartitions added in r18 must actually collapse the
# (feat-key groupBy, locus window) exchange pairs: l2g_score's plan
# carries exactly ONE data-side exchange (the (point, study) prefix
# that per_pair, the flank window and the rank window all ride).
def test_l2g_score_single_data_exchange(spark, sf_dir):
    import re

    from gentropy_spark.plans.l2g import q_l2g_score

    df = q_l2g_score(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    n_ex = len(re.findall(r"\(\d+\) Exchange\n", plan))
    assert n_ex == 1, f"expected 1 data-side exchange, got {n_ex}"
