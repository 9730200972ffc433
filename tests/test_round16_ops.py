"""Round-16 fixes: bpe_encode's size-gated vocab join, semi_lead_clump's
AQE-scaled shuffle width, and checkpoint storage release (r15 verdict
items 2/4 + advisory 2)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_bpe_encode_vocab_join_not_hinted(spark):
    """The vocabulary join must carry NO forced broadcast hint: the
    vocab side is corpus-unbounded (every distinct token), so a forced
    broadcast is a job-killing 8 GB-limit hit at web scale (r15
    verdict item 2). The trainer's own 1-row best-pair broadcasts are
    behind localCheckpoint cuts, so the encode plan's ONLY join is the
    vocab join — assert the whole analyzed plan is hint-free, and that
    AQE (free to pick) still chooses a broadcast at test scale."""
    from gentropy_spark.plans.llm_pipeline import q_bpe_encode

    df = q_bpe_encode(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, (
        "vocab join must be size-gated by AQE, not force-broadcast"
    )
    assert "UnresolvedHint" not in analyzed
    # AQE remains free to broadcast when the vocab is actually small:
    # at sf0.001 the executed plan should pick a broadcast join.
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, (
        "expected AQE to choose broadcast for the tiny test vocab"
    )


def test_bpe_checkpoints_released(spark):
    """Each bpe build localCheckpoints K vocab-grain states whose
    internal RDDs the CacheManager cannot see; release_caches() must
    free them (r15 advisory 2)."""
    from gentropy_spark.plans.llm_pipeline import BPE_TRAIN_MERGES, q_bpe_train
    from gentropy_spark.session import release_caches

    release_caches()  # start from a clean slate
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    q_bpe_train(spark, SF).collect()
    during = sc._jsc.getPersistentRDDs().size()
    assert during >= before + BPE_TRAIN_MERGES, (
        f"expected >= {BPE_TRAIN_MERGES} checkpointed states, "
        f"saw {during - before}"
    )
    release_caches()
    after = sc._jsc.getPersistentRDDs().size()
    assert after <= before, (
        f"release_caches leaked {after - before} checkpointed RDDs"
    )


def test_bpe_keys_not_memoized_and_rebuild_after_release(spark):
    """Releasing the checkpoints strands any HELD bpe DataFrame
    (truncated lineage cannot recompute), so the registry must never
    memoize bpe keys — every wrapped call rebuilds the chain, making
    release-then-recollect safe. Pin the exclusion and prove the
    rebuild survives a release between calls with identical values."""
    from gentropy_spark.plans.registry import _PLAN_CACHE_KEYS, full_registry
    from gentropy_spark.session import release_caches

    assert "bpe_train" not in _PLAN_CACHE_KEYS
    assert "bpe_encode" not in _PLAN_CACHE_KEYS
    fn = full_registry()["bpe_train"].fn
    rows1 = sorted((r.step, r.merged_pair) for r in fn(spark, SF).collect())
    release_caches()
    rows2 = sorted((r.step, r.merged_pair) for r in fn(spark, SF).collect())
    assert rows1 == rows2
    release_caches()


def test_semi_lead_clump_width_scales_with_conf(spark):
    """The stream's shuffle width must follow
    spark.sql.shuffle.partitions (cluster-scalable), not the driver
    host's defaultParallelism (r15 verdict item 4) — and values must
    be identical across widths (the carry logic is
    partitioning-agnostic)."""
    from gentropy_spark.operators.clumping import semi_lead_clump

    rows = [
        (i, 1, "c", 1000 * i, float((i * 37) % 101)) for i in range(1, 200)
    ]
    df = spark.createDataFrame(
        rows,
        "point_id long, study_id long, contig string, pos long, signif double",
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for width in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            out = semi_lead_clump(df, window=2500)
            results[width] = sorted(
                (r.point_id, r.is_semi_lead) for r in out.collect()
            )
        assert results["3"] == results["17"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_semi_lead_clump_no_fixed_width_repartition():
    """Pin the source contract: the repartition call must name only
    key columns (no numPartitions literal), so AQE owns the width."""
    import inspect

    from gentropy_spark.operators import clumping

    src = inspect.getsource(clumping.semi_lead_clump)
    assert ".repartition(target" not in src
    assert "defaultParallelism" not in src
