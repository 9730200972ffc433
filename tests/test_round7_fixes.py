"""Regression tests for the round-7 advisory fixes.

Each test pins a defect reported by the round-6 review: inverted
sampling policy on zero-keep-rate strata, outer-join row duplication
in salted_join, session-timezone-dependent NTZ normalization, and the
type-fragile connected-components fixpoint test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_mixture_rebalance_zero_rate_emits_zero_threshold(
    spark, sf_dir, monkeypatch
):
    """A stratum with keep_rate 0 must emit threshold '0000' (keep
    nothing), not 'ffff...' (keep everything) from %04x of -1."""
    from gentropy_spark.plans import llm_pipeline as lp

    monkeypatch.setattr(lp, "TARGET_SHARES", {"en": 1.0})
    out = lp.q_mixture_rebalance(spark, sf_dir).collect()
    by_lang = {r["lang"]: r for r in out}
    assert "en" in by_lang and by_lang["en"]["keep_rate"] == 1.0
    for lang, row in by_lang.items():
        if lang == "en":
            continue
        assert row["keep_rate"] == 0.0
        assert row["sample_threshold_hex"] == "0000", (
            f"{lang}: zero keep rate must keep nothing, got "
            f"{row['sample_threshold_hex']!r}"
        )


def test_salted_join_rejects_right_and_full_outer(spark):
    from gentropy_spark.operators.reshape import salted_join

    left = spark.range(4).withColumnRenamed("id", "k")
    right = spark.range(8).withColumnRenamed("id", "k")
    for bad in ("right", "full_outer", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, key="k", how=bad)
    # the supported modes still work and match the plain join
    plain = left.join(right, on="k", how="left").count()
    assert salted_join(left, right, key="k", how="left").count() == plain


def test_ntz_normalization_is_session_tz_independent(spark):
    """normalize_events_ts must interpret an NTZ wall clock as UTC no
    matter what spark.sql.session.timeZone is set to."""
    from gentropy_spark.sources.readers import normalize_events_ts, ts_micros

    ntz = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-03-01 12:34:56.789123' AS ts"
    )
    expected_us = 1709296496789123  # 2024-03-01T12:34:56.789123Z

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = normalize_events_ts(ntz).select(
                F.unix_micros("ts").alias("us")
            ).first()["us"]
            assert got == expected_us, f"session tz {tz}: {got}"
            got2 = ntz.select(ts_micros(ntz).alias("us")).first()["us"]
            assert got2 == expected_us, f"ts_micros under {tz}: {got2}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_duplicate_clusters_string_ids_converge(spark):
    """The fixpoint detector must work for non-numeric ids (the old
    sum-of-labels test returned NULL==NULL after one round and stopped
    early on >1-hop chains)."""
    from gentropy_spark.operators.dedup import duplicate_clusters

    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], ["doc_id"]
    )
    # chain a-b-c-d needs THREE propagation rounds to pull 'd' down
    # to label 'a'; one round would leave d labelled 'c'.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(docs, edges, id_col="doc_id").collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}


def test_approx_percentile_variant_within_tolerance(spark):
    """The approx (GK-sketch) percentile path must stay close to exact
    at sf0.1 — the documented 100 TB drop-in, made real and measured."""
    from gentropy_spark.plans.relational import q_decile_stats, q_dwell_time_stats

    sf = "/root/testdata/sf0.1"
    for fn, key, cols in (
        (q_decile_stats, "c_mktsegment", ["p25_bal", "p50_bal", "p75_bal"]),
        (q_dwell_time_stats, "event_type", ["p25_gap_s", "p50_gap_s", "p90_gap_s"]),
    ):
        exact = {r[key]: r for r in fn(spark, sf, approx=False).collect()}
        approx = {r[key]: r for r in fn(spark, sf, approx=True).collect()}
        assert exact.keys() == approx.keys()
        for k in exact:
            for c in cols:
                e, a = float(exact[k][c]), float(approx[k][c])
                spread = max(abs(e), 1.0)
                assert abs(e - a) <= 0.02 * spread + 1.0, (
                    f"{fn.__name__}.{c}[{k}]: exact {e} vs approx {a}"
                )


def test_ld_backend_seam_dispatch_and_equivalence(spark):
    """r7 LD-backend seam: both backends serve the same two
    capabilities, the ancestry dispatch mirrors the reference rule,
    and the dense hand-off matrix is symmetric with unit diagonal."""
    import numpy as np

    from gentropy_spark.operators.ld_backend import (
        EntryTableLDBackend,
        SyntheticGridLDBackend,
        backend_for_ancestry,
        locus_numpy_matrix,
    )

    variants = spark.createDataFrame(
        [("chr1", int(p * 3_600_000_000), f"v{k}") for k, p in enumerate(range(8))],
        ["contig", "pos", "variant_id"],
    )
    # gnomAD-shaped entry table over the same variants (banded, ut)
    index = variants.selectExpr(
        "contig", "pos", "variant_id",
        "CAST(pos / 3600000000 AS LONG) AS idx",
    )
    entries = spark.createDataFrame(
        [(i, j, round(0.9 ** (j - i), 6)) for i in range(8) for j in range(i, 8)],
        ["idx_i", "idx_j", "r"],
    )

    # dispatch rule: nfe/csa/afr -> grid backend, others -> entry table
    b_nfe = backend_for_ancestry("nfe", variants, entries, index)
    b_eas = backend_for_ancestry("eas", variants, entries, index)
    assert isinstance(b_nfe, SyntheticGridLDBackend)
    assert isinstance(b_eas, EntryTableLDBackend)

    for backend in (b_nfe, b_eas):
        ids, M = locus_numpy_matrix(
            backend, "chr1", 0, int(5 * 3_600_000_000)
        )
        assert len(ids) == 6 and M.shape == (6, 6)
        assert np.allclose(M, M.T)
        assert np.allclose(np.diag(M), 1.0)
        assert (M[np.triu_indices(6, 1)] > 0).all()

    # the entry-table slice must NOT read outside the index window
    sub_idx = b_eas.locus_index("chr1", 0, int(2 * 3_600_000_000))
    ent = b_eas.block_entries(sub_idx)
    mx = ent.agg({"idx_i": "max", "idx_j": "max"}).first()
    assert max(mx[0], mx[1]) <= 2
