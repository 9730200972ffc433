"""Round-14 operator additions: bm25_topk, semdedup_prune,
quality_classifier (SURVEY E44-E46).

The value-exactness proof is the driver oracle gate (each key has a
DuckDB oracle; verified at sf0.001/0.01/0.1 when added). These tests
pin the SEMANTIC invariants the hash gate can't express.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bm25_ranking_invariants(spark):
    from gentropy_spark.plans.llm_pipeline import (
        BM25_TOP_K,
        q_bm25_topk,
    )

    rows = q_bm25_topk(spark, SF).collect()
    assert rows, "bm25_topk returned no rows"
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) <= BM25_TOP_K
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            # score non-increasing with rank; doc_id breaks ties
            assert a.bm25 > b.bm25 or (
                a.bm25 == b.bm25 and a.doc_id < b.doc_id
            )
        for r in rs:
            assert math.isfinite(r.bm25) and r.bm25 > 0
            # queries are the benchmark split; hits are training docs
            assert qid % 10 == 0 and r.doc_id % 10 != 0


def test_bm25_query_bound_guard_is_lazy(spark):
    """r14 advisory (low): the bounded-queries guard must not run a
    Spark job at plan-BUILD time (plan audits / gen_plans_doc build
    every q_* lazily) — it fires via raise_error at execution."""
    import pytest

    import gentropy_spark.plans.llm_pipeline as lp

    old = lp.BM25_MAX_QUERY_DOCS
    try:
        lp.BM25_MAX_QUERY_DOCS = 0
        # build + explain must succeed (no eager job, no raise)
        df = lp.q_bm25_topk(spark, SF)
        df.explain()
        with pytest.raises(Exception, match="bounded-query"):
            df.collect()
    finally:
        lp.BM25_MAX_QUERY_DOCS = old
    assert len(lp.q_bm25_topk(spark, SF).take(1)) == 1


def test_semdedup_priority_one_always_kept(spark):
    """The published rule keeps the farthest-from-centroid member of
    every near-dup group — so the cluster's priority-1 member (no
    higher-priority neighbour exists) can never be pruned."""
    from gentropy_spark.plans.llm_pipeline import q_semdedup_prune

    out = q_semdedup_prune(spark, SF)
    bad = out.filter((F.col("priority") == 1) & ~F.col("keep")).count()
    assert bad == 0
    # pruning must actually fire somewhere (EPS chosen for that)
    assert out.filter(~F.col("keep")).count() > 0
    # every vector classified exactly once
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert out.count() == n_emb


def test_quality_classifier_score_bounds(spark):
    """logit = S/(M*L) - 0.5 with w_int in [0, M) implies logit in
    [-0.5, 0.5) — scores live strictly inside sigmoid of that band,
    and keep is exactly score >= 0.5."""
    from gentropy_spark.plans.llm_pipeline import q_quality_classifier

    rows = q_quality_classifier(spark, SF).collect()
    assert rows
    lo = 1.0 / (1.0 + math.exp(0.5))  # sigmoid(-0.5)
    hi = 1.0 / (1.0 + math.exp(-0.5))
    for r in rows:
        assert lo - 1e-6 <= r.quality_score <= hi + 1e-6
        assert r.keep == (r.quality_score >= 0.5)
        assert r.n_tokens > 0


def test_bpe_train_merge_invariants(spark):
    """Every new pair created by a merge sits inside an occurrence of
    the merged pair, so the argmax pair count is NON-INCREASING across
    steps — the core monotonicity of the BPE trainer."""
    from gentropy_spark.plans.llm_pipeline import (
        BPE_TRAIN_MERGES,
        q_bpe_train,
    )

    rows = sorted(q_bpe_train(spark, SF).collect(), key=lambda r: r.step)
    assert [r.step for r in rows] == list(range(1, BPE_TRAIN_MERGES + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.pair_count >= b.pair_count
    merged = set()
    for r in rows:
        # a merge is two space-separated symbols, never re-merged
        assert " " in r.merged_pair and r.merged_pair not in merged
        merged.add(r.merged_pair)
        assert r.pair_count > 0


def test_bpe_merge_fold_adjacent_occurrences(spark, tmp_path):
    """r14 advisory (high): space-sentinel replace under-merges
    adjacent occurrences of the best pair — ' l l l l ' must merge to
    'll ll', not 'll l l'. Pin the fold implementation against an
    INDEPENDENT Python Sennrich reference (greedy left-to-right,
    non-overlapping, count-DESC / pair-ASC tie-break) on a corpus
    crafted so the winning pairs cascade through adjacent runs
    ('llll') and a tie is broken lexicographically — and prove the
    Spark fold and the DuckDB list_reduce oracle both match it.
    """
    import duckdb
    import pandas as pd

    from gentropy_spark.plans.llm_pipeline import (
        BPE_TRAIN_MERGES,
        BPE_TRAIN_SQL,
        q_bpe_train,
    )

    texts = ["llll llll", "llll", "anan anan banana", "ll lab lab"]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )

    # Independent reference: classic dict-of-symbol-tuples BPE.
    def ref_bpe(word_freq: dict, k: int) -> list:
        vocab = {tuple(w): f for w, f in word_freq.items()}
        merges = []
        for step in range(1, k + 1):
            counts: dict = {}
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + f
            best = min(counts, key=lambda p: (-counts[p], " ".join(p)))
            merges.append((step, " ".join(best), counts[best]))
            a, b = best
            nxt = {}
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
            vocab = nxt
        return merges

    wf: dict = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    expected = ref_bpe(wf, BPE_TRAIN_MERGES)
    # the corpus is crafted so step 1 hits the adjacency cascade
    assert expected[0] == (1, "l l", 10)

    got_spark = sorted(
        (r.step, r.merged_pair, r.pair_count)
        for r in q_bpe_train(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    got_duck = sorted(tuple(r) for r in con.execute(BPE_TRAIN_SQL).fetchall())
    assert got_spark == expected
    assert got_duck == expected


def test_epoch_shuffle_is_a_permutation_and_epoch_sensitive(spark):
    from gentropy_spark.plans.llm_pipeline import (
        EPOCH_SHUFFLE_SHARDS,
        q_epoch_shuffle,
    )
    import gentropy_spark.plans.llm_pipeline as lp

    rows = q_epoch_shuffle(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # a permutation: every doc exactly once, positions contiguous per shard
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.shard < EPOCH_SHUFFLE_SHARDS
        by_shard.setdefault(r.shard, []).append(r.position)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # a DIFFERENT epoch gives a different permutation (same doc set)
    old = lp.EPOCH_SHUFFLE_EPOCH
    try:
        lp.EPOCH_SHUFFLE_EPOCH = old + 1
        rows2 = q_epoch_shuffle(spark, SF).collect()
    finally:
        lp.EPOCH_SHUFFLE_EPOCH = old
    assert {(r.doc_id, r.shard, r.position) for r in rows2} != {
        (r.doc_id, r.shard, r.position) for r in rows
    }


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_semdedup_assignment_is_arrow_not_hof(spark):
    """Scale-posture pin (the 100x finding): the centroid-assignment
    distance must ride the Arrow-batched l2 kernel — an interpreted
    `aggregate(zip_with(...))` HOF in the assignment projection
    single-task-stalls at adaptive-K scale. Also pins the broadcast
    shape: centroids and the K row are broadcast, never shuffled."""
    from gentropy_spark.plans.llm_pipeline import q_semdedup_prune

    plan = _formatted(q_semdedup_prune(spark, SF))
    assert "ArrowEvalPython" in plan, plan[:2000]
    assert "aggregate(zip_with" not in plan
    assert "BroadcastExchange" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row K + centroid builds


def test_bm25_broadcasts_query_side_and_prunes_scan(spark):
    """The postings join must BROADCAST the (tiny by contract) query
    term set — a shuffled query side would re-exchange the corpus-
    sized postings — and the documents scan must prune to the two
    referenced columns."""
    from gentropy_spark.plans.llm_pipeline import q_bm25_topk

    plan = _formatted(q_bm25_topk(spark, SF))
    assert plan.count("BroadcastExchange") >= 2  # qtok, qterms (+stats)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_epoch_shuffle_single_exchange(spark):
    """One shuffle on the shard key; the position window must reuse
    it — a global sort would serialize the permutation."""
    from gentropy_spark.plans.llm_pipeline import q_epoch_shuffle

    plan = _formatted(q_epoch_shuffle(spark, SF))
    import re

    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"
