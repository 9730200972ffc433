"""Round-8 additions: PanUKBB ingested LD backend + collect-loop guard."""

from __future__ import annotations

import numpy as np
import pytest


def _panukbb_fixture(spark):
    """4-variant locus: idx 2 is allele-flipped (allele_order -1)."""
    index = spark.createDataFrame(
        [
            (0, "1_100_A_C", "1", 100, 1),
            (1, "1_200_G_T", "1", 200, 1),
            (2, "1_300_C_A", "1", 300, -1),
            (3, "1_400_T_G", "1", 400, 1),
        ],
        ["idx", "variant_id", "contig", "pos", "allele_order"],
    )
    # Upper-half entries as Hail stores them (diag carries the raw
    # half value, deliberately NOT 1, to prove the unit-diag force).
    half = [
        (0, 0, 0.9), (0, 1, 0.5), (0, 2, 0.3), (0, 3, 0.1),
        (1, 1, 1.1), (1, 2, 0.4), (1, 3, 0.2),
        (2, 2, 0.8), (2, 3, 0.6),
        (3, 3, 1.0),
    ]
    entries = spark.createDataFrame(half, ["idx_i", "idx_j", "r"])
    return index, entries, half


def _expected_matrix(half, allele_order):
    n = len(allele_order)
    H = np.zeros((n, n))
    for i, j, r in half:
        H[i, j] = r
    M = H + H.T - np.diag(np.diag(H))
    sign = np.outer(allele_order, allele_order)
    np.fill_diagonal(sign, 1)
    M = M * sign
    np.fill_diagonal(M, 1.0)
    return M


def test_panukbb_backend_matches_reference_numpy_construction(spark):
    """block_entries == half+half.T−diag, outer allele sign, unit diag
    (pan_ukbb_ld/ld.py:154-199 get_numpy_matrix semantics)."""
    from gentropy_spark.operators.ld_backend import (
        PanUKBBEntryBackend,
        locus_numpy_matrix,
    )

    index, entries, half = _panukbb_fixture(spark)
    backend = PanUKBBEntryBackend(index, entries)
    ids, M = locus_numpy_matrix(backend, "1", 100, 400)
    assert ids == ["1_100_A_C", "1_200_G_T", "1_300_C_A", "1_400_T_G"]
    expected = _expected_matrix(half, [1, 1, -1, 1])
    np.testing.assert_allclose(M, expected, atol=1e-12)
    # Off-diagonal sign flip visible: (0,2) was +0.3, flipped to -0.3.
    assert M[0, 2] == pytest.approx(-0.3)
    assert M[2, 3] == pytest.approx(-0.6)
    # Diagonal forced to 1 even though the raw half diag was 0.9/1.1.
    np.testing.assert_allclose(np.diag(M), np.ones(4))
    # Symmetry.
    np.testing.assert_allclose(M, M.T)


def test_panukbb_backend_locus_slice_prunes(spark):
    from gentropy_spark.operators.ld_backend import (
        PanUKBBEntryBackend,
        locus_numpy_matrix,
    )

    index, entries, half = _panukbb_fixture(spark)
    backend = PanUKBBEntryBackend(index, entries)
    ids, M = locus_numpy_matrix(backend, "1", 150, 350)
    assert ids == ["1_200_G_T", "1_300_C_A"]
    assert M.shape == (2, 2)
    assert M[0, 1] == pytest.approx(-0.4)  # sign-flipped by idx 2


def test_backend_dispatch_prefers_ingested_panukbb(spark):
    from gentropy_spark.operators.ld_backend import (
        EntryTableLDBackend,
        PanUKBBEntryBackend,
        SyntheticGridLDBackend,
        backend_for_ancestry,
    )

    index, entries, _ = _panukbb_fixture(spark)
    variants = index.select(
        "contig", "pos", "variant_id"
    )
    gnomad_index = index.select("idx", "variant_id", "contig", "pos")
    stores = {"EUR": (index, entries)}
    b = backend_for_ancestry(
        "nfe", variants, entries, gnomad_index, panukbb_stores=stores
    )
    assert isinstance(b, PanUKBBEntryBackend)
    b2 = backend_for_ancestry("nfe", variants, entries, gnomad_index)
    assert isinstance(b2, SyntheticGridLDBackend)
    # A population WITHOUT its own ingested store must NOT be served
    # another population's matrix — it falls back to the synthetic
    # grid under its own label.
    b_afr = backend_for_ancestry(
        "afr", variants, entries, gnomad_index, panukbb_stores=stores
    )
    assert isinstance(b_afr, SyntheticGridLDBackend)
    b3 = backend_for_ancestry(
        "eas", variants, entries, gnomad_index, panukbb_stores=stores
    )
    assert isinstance(b3, EntryTableLDBackend)


def test_locus_collect_guard_warns(spark):
    import gentropy_spark.operators.ld_backend as lb

    index, entries, _ = _panukbb_fixture(spark)
    backend = lb.PanUKBBEntryBackend(index, entries)
    old_calls, old_thresh = lb._locus_collect_calls, lb._LOCUS_COLLECT_WARN_AFTER
    try:
        lb._locus_collect_calls = 0
        lb._LOCUS_COLLECT_WARN_AFTER = 2
        with pytest.warns(RuntimeWarning, match="locus_dense_matrices"):
            lb.locus_numpy_matrix(backend, "1", 100, 200)
            lb.locus_numpy_matrix(backend, "1", 100, 200)
    finally:
        lb._locus_collect_calls = old_calls
        lb._LOCUS_COLLECT_WARN_AFTER = old_thresh


def test_trainer_empty_validation_fold_disables_early_stopping():
    """r7 advisory: an empty last fold must not zero the ensemble."""
    from gentropy_spark.operators.l2g_trainer import fit_gbm, predict_margin

    rng = np.random.RandomState(7)
    X = rng.rand(60, 4)
    y = (X[:, 0] + 0.2 * rng.rand(60) > 0.6).astype(float)
    # Directly: an all-False valid mask must behave like no early stop.
    trees_none = fit_gbm(X, y, n_trees=10, lr=0.3, max_depth=2)
    trees_guard = fit_gbm(
        X, y, n_trees=10, lr=0.3, max_depth=2,
        early_stopping_rounds=2, valid_mask=np.zeros(60, dtype=bool),
    )
    assert len(trees_guard) > 0
    p1 = predict_margin(trees_none, X, 0.3)
    assert np.isfinite(p1).all()


def test_native_sums_flag_switches_q1_profile(spark, sf_dir, monkeypatch):
    """GENTROPY_SPARK_NATIVE_SUMS=1 must drop the decimal casts from the
    q1 aggregate (native double sums) while keeping values within
    float tolerance of the parity profile."""
    import importlib

    import gentropy_spark.plans.relational as R

    monkeypatch.delenv("GENTROPY_SPARK_NATIVE_SUMS", raising=False)
    exact = {
        (r.l_returnflag, r.l_linestatus): r.sum_charge
        for r in R.q1_pricing_summary(spark, sf_dir).collect()
    }
    plan_exact = R.q1_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "decimal(38,6)" in plan_exact
    monkeypatch.setenv("GENTROPY_SPARK_NATIVE_SUMS", "1")
    native_df = R.q1_pricing_summary(spark, sf_dir)
    plan_native = native_df._jdf.queryExecution().executedPlan().toString()
    assert "decimal(38,6)" not in plan_native
    for r in native_df.collect():
        assert exact[(r.l_returnflag, r.l_linestatus)] == pytest.approx(
            r.sum_charge, rel=1e-9
        )


# --- real uncompressed-format codecs (operators/codecs.py) -----------------
def test_ppm_roundtrip_byte_exact():
    from gentropy_spark.operators.codecs import decode_ppm, encode_ppm

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    meta = decode_ppm(encode_ppm(px))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (7, 5, 3)
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


def test_ppm_header_comments_skipped():
    from gentropy_spark.operators.codecs import decode_ppm

    payload = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    meta = decode_ppm(payload)
    assert (meta["width"], meta["height"]) == (2, 1)
    assert meta["mean_value"] == pytest.approx(35.0)


def test_bmp_roundtrip_handles_row_padding():
    from gentropy_spark.operators.codecs import decode_bmp, encode_bmp

    # width 3 → 9-byte rows padded to 12: padding must NOT skew the mean.
    px = np.full((2, 3, 3), 200, dtype=np.uint8)
    meta = decode_bmp(encode_bmp(px))
    assert (meta["width"], meta["height"]) == (3, 2)
    assert meta["mean_value"] == pytest.approx(200.0)


def test_wav_pcm16_decode():
    from gentropy_spark.operators.codecs import decode_wav, encode_wav

    samples = np.array([0, 1000, -1000, 32000], dtype=np.int16)
    meta = decode_wav(encode_wav(samples, rate=8000, channels=1))
    assert meta["codec"] == "wav"
    assert meta["sample_rate"] == 8000
    assert meta["n_channels"] == 1
    assert meta["width"] == 4
    assert meta["mean_value"] == pytest.approx(np.abs(samples).mean())


def test_decode_any_dispatch_and_corrupt_fallback():
    from gentropy_spark.operators.codecs import decode_any, encode_ppm

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_any(encode_ppm(px))["codec"] == "ppm"
    assert decode_any(b"plain text payload")["codec"] == "stub"
    # Truncated PPM (valid magic, corrupt body) must fall back, not raise.
    assert decode_any(b"P6\n100 100\n255\n\x00\x01")["codec"] == "stub"


def test_decode_features_real_media_through_mapinpandas(spark):
    """End-to-end: real BMP/PPM/WAV payloads through the SAME
    mapInPandas decode plan as the registry query — real fields
    populated, stub rows get NULLs."""
    from gentropy_spark.operators.codecs import encode_bmp, encode_ppm, encode_wav
    from gentropy_spark.operators.multimodal import decode_features

    ppm = encode_ppm(np.full((4, 6, 3), 100, dtype=np.uint8))
    bmp = encode_bmp(np.full((3, 5, 3), 50, dtype=np.uint8))
    wav = encode_wav(np.array([500, -500], dtype=np.int16), rate=44100)
    rows = [
        (1, bytearray(ppm)),
        (2, bytearray(bmp)),
        (3, bytearray(wav)),
        (4, bytearray(b"just text")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in decode_features(df).collect()}
    assert got[1].codec == "ppm" and (got[1].width, got[1].height) == (6, 4)
    assert got[1].mean_value == pytest.approx(100.0)
    assert got[2].codec == "bmp" and (got[2].width, got[2].height) == (5, 3)
    assert got[3].codec == "wav" and got[3].sample_rate == 44100
    assert got[4].codec == "stub" and got[4].width is None
    # The stub byte-features remain populated for every row.
    assert all(v.n_bytes > 0 for v in got.values())
