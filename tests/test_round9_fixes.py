"""Round-9 targeted tests.

1. PNG codec (operators/codecs.py): real zlib-inflate + filter
   reconstruction, exercised against encode_png round trips covering
   all five scanline filters and color types 0/2/3/4/6, plus the
   corrupt/unsupported fallbacks and the mapInPandas pipeline path.
2. study_locus_qc_flags plan shape is covered in test_plans.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest


def _rng(seed=7):
    return np.random.default_rng(seed)


# --- PNG round trips -------------------------------------------------------
def test_png_rgb_roundtrip_all_filters():
    """encode_png with filter_type=None cycles filters 0..4 per row,
    so one decode covers every unfilter path byte-exactly."""
    from gentropy_spark.operators.codecs import decode_png, encode_png

    px = _rng().integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    meta = decode_png(encode_png(px, color_type=2, filter_type=None))
    assert meta["codec"] == "png"
    assert (meta["width"], meta["height"], meta["n_channels"]) == (5, 7, 3)
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_single_filter_exact(ftype):
    from gentropy_spark.operators.codecs import decode_png, encode_png

    px = _rng(ftype).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    meta = decode_png(encode_png(px, filter_type=ftype))
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


@pytest.mark.parametrize(
    "color_type,channels",
    [(0, 1), (2, 3), (4, 2), (6, 4)],
)
def test_png_color_types(color_type, channels):
    from gentropy_spark.operators.codecs import decode_png, encode_png

    shape = (5, 4) if channels == 1 else (5, 4, channels)
    px = _rng(color_type).integers(0, 256, size=shape, dtype=np.uint8)
    meta = decode_png(encode_png(px, color_type=color_type))
    assert meta["codec"] == "png"
    assert (meta["width"], meta["height"]) == (4, 5)
    assert meta["n_channels"] == channels
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


def test_png_palette_expands_plte():
    """Color type 3: indices resolve through PLTE, mean over RGB."""
    from gentropy_spark.operators.codecs import (
        PNG_SIGNATURE,
        _png_chunk,
        decode_png,
    )

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    meta = decode_png(png)
    assert meta["n_channels"] == 3
    expected = palette[idx.reshape(-1)].mean()
    assert meta["mean_value"] == pytest.approx(float(expected))


def test_png_unsupported_shapes_fall_back_to_stub():
    """16-bit depth, Adam7, truncated IDAT → stub via decode_any,
    never an exception out of the batch."""
    from gentropy_spark.operators.codecs import (
        PNG_SIGNATURE,
        _png_chunk,
        decode_any,
        encode_png,
    )

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr16)
    assert decode_any(png16)["codec"] == "stub"

    ihdr_adam = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png_adam = PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr_adam)
    assert decode_any(png_adam)["codec"] == "stub"

    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    assert decode_any(good[: len(good) // 2])["codec"] == "stub"


def test_png_through_mapinpandas_pipeline(spark):
    """A PNG payload rides the same decode_features contract as
    PPM/BMP/WAV — schema, batching, N rows in → N rows out."""
    from gentropy_spark.operators.codecs import encode_png, encode_ppm
    from gentropy_spark.operators.multimodal import decode_features

    px = _rng(3).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(px))),
        (2, bytearray(encode_ppm(px))),
        (3, bytearray(b"not media")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_features(df).collect()}
    assert got[1].codec == "png" and (got[1].width, got[1].height) == (8, 8)
    assert got[1].mean_value == pytest.approx(float(px.mean()))
    assert got[2].codec == "ppm"
    assert got[3].codec == "stub"


# --- χ² Pandas-UDF adapters (functions/udf.py, reference common/udf.py) ----
def test_chi2_udf_adapters_match_reference_doctests(spark):
    """The reference's own doctest fixtures, verbatim."""
    import pyspark.sql.functions as f

    from gentropy_spark.functions.udf import (
        chi2_inverse_survival_function,
        chi2_survival_function,
    )

    df = spark.createDataFrame(
        [(0.1,), (0.05,), (0.001,)], "pValue double"
    )
    got = {
        r.pValue: r.chi2_stat
        for r in df.select(
            "pValue",
            f.round(chi2_inverse_survival_function("pValue"), 2).alias(
                "chi2_stat"
            ),
        ).collect()
    }
    assert got == {0.1: 2.71, 0.05: 3.84, 0.001: 10.83}

    df2 = spark.createDataFrame(
        [(1.0, 1.0), (-1.0, 1.0), (10.0, 100.0)], "zScore double, chi2 double"
    )
    rows = df2.select(
        f.round(chi2_survival_function(f.col("zScore") ** 2), 2).alias("pz"),
        f.round(chi2_survival_function("chi2"), 2).alias("pc"),
    ).collect()
    assert [(r.pz, r.pc) for r in rows] == [
        (0.32, 0.32),
        (0.32, 0.32),
        (0.0, 0.0),
    ]


def test_chi2_udf_adapters_agree_with_column_kernels(spark):
    """All three surfaces (numpy UDF, Column kernel, SQL builder) share
    one coefficient table — they must agree to ~1e-9 pointwise."""
    import numpy as np
    import pyspark.sql.functions as f

    from gentropy_spark.functions.distributions import (
        chi2_isf_1df_col,
        chi2_sf_1df_col,
    )
    from gentropy_spark.functions.udf import (
        chi2_inverse_survival_function,
        chi2_survival_function,
    )

    ps = [0.001, 0.01, 0.02425, 0.1, 0.3, 0.5, 0.7, 0.9, 0.97, 0.999]
    xs = [0.01, 0.5, 1.0, 3.84, 10.0, 30.0, 80.0]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    rows = df.select(
        chi2_inverse_survival_function("p").alias("udf"),
        chi2_isf_1df_col(f.col("p")).alias("col"),
    ).collect()
    assert all(abs(r.udf - r.col) < 1e-9 for r in rows), rows
    df2 = spark.createDataFrame([(x,) for x in xs], "x double")
    rows2 = df2.select(
        chi2_survival_function("x").alias("udf"),
        chi2_sf_1df_col(f.col("x")).alias("col"),
    ).collect()
    assert all(abs(r.udf - r.col) < 1e-9 for r in rows2), rows2


# --- streaming upsert sink: crash between staging write and swap -----------
def test_upsert_sink_crash_and_resume_exactly_once(spark, sf_dir, tmp_path):
    """Failure-path evidence for the foreachBatch MERGE sink (r8 verdict
    item 9): inject a crash AFTER the staging write but BEFORE the
    atomic swap while draining a second file. The target must (a)
    survive the crash unchanged (the swap never happened, the backup
    restore ran), and (b) after a plain re-drain over the same
    checkpoint equal the batch dedup of ALL input — processed exactly
    once, no double-counted n_dups, no lost keys."""
    import pathlib
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pytest as _pytest

    from gentropy_spark.streaming.windowed import run_upsert_sink

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    # Phase 1: drain the first file — clean baseline.
    run_upsert_sink(spark, str(src), target_dir=target, checkpoint=ckpt)
    base = {
        (r.user_id, r.event_type, r.pos): (r.first_event_id, r.n_dups)
        for r in spark.read.parquet(target).collect()
    }
    assert base

    # Second file: same natural keys, shifted surrogate ids — every key
    # becomes a duplicate pair (n_dups must exactly double; min id must
    # stay the original).
    tbl = pq.read_table(src / "events.parquet")
    shifted = tbl.set_column(
        tbl.schema.get_field_index("event_id"),
        "event_id",
        pc.add(tbl.column("event_id"), 10_000_000),
    )
    pq.write_table(shifted, src / "events_b.parquet")

    # Phase 2: drain with an injected crash between staging and swap.
    orig_rename = pathlib.Path.rename
    state = {"armed": True}

    def flaky_rename(self, dst):
        if state["armed"] and str(self).endswith("__upsert_staging"):
            state["armed"] = False
            raise OSError("injected crash before swap")
        return orig_rename(self, dst)

    pathlib.Path.rename = flaky_rename
    try:
        with _pytest.raises(Exception, match="injected crash|STREAM"):
            run_upsert_sink(spark, str(src), target_dir=target, checkpoint=ckpt)
    finally:
        pathlib.Path.rename = orig_rename

    # (a) Atomicity: the interrupted drain left the PHASE-1 target.
    after_crash = {
        (r.user_id, r.event_type, r.pos): (r.first_event_id, r.n_dups)
        for r in spark.read.parquet(target).collect()
    }
    assert after_crash == base

    # Phase 3: plain re-drain over the SAME checkpoint.
    run_upsert_sink(spark, str(src), target_dir=target, checkpoint=ckpt)
    final = {
        (r.user_id, r.event_type, r.pos): (r.first_event_id, r.n_dups)
        for r in spark.read.parquet(target).collect()
    }
    assert set(final) == set(base)
    for key, (first_id, n) in base.items():
        got_first, got_n = final[key]
        assert got_first == first_id, key  # min id survives the merge
        assert got_n == 2 * n, key  # each key seen exactly twice


# --- salted join: measured skew evenness ------------------------------------
def test_salted_join_spreads_hot_key_measured(spark):
    """Skew posture, measured (r8 verdict item 5): one key owns 30% of
    the probe side. With broadcast disabled (the regime salting exists
    for) and AQE off (so runtime coalescing can't mask the raw shuffle
    layout), the plain shuffle join lands every hot-key output row in
    ONE partition; the salted join spreads it across n_salts
    partitions. We assert on rows-per-output-partition — the direct
    driver of task wall-time for a join — and on result equality."""
    from pyspark.sql import functions as F

    from gentropy_spark.operators.reshape import salted_join

    n, hot_share, n_keys = 200_000, 0.3, 1_000
    left = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % n_keys)
        .alias("k"),
    )
    right = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("dim_val")
    )

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # The test session runs 8 shuffle partitions; with only 8 buckets
    # the 16 salt groups land lumpily (2-4 per bucket) and understate
    # the spread. 64 partitions ~ a real cluster's task granularity.
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        def max_partition_rows(df):
            sizes = (
                df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .count()
                .collect()
            )
            return max(r["count"] for r in sizes)

        plain = left.join(right, on="k")
        salted = salted_join(left, right, key="k", n_salts=16)

        assert salted.count() == plain.count() == n
        # checksum equality: same rows, not just same cardinality
        chk = lambda df: df.agg(
            F.sum(F.col("row_id") * F.col("dim_val"))
        ).collect()[0][0]
        assert chk(salted) == chk(plain)

        hot_plain = max_partition_rows(plain)
        hot_salted = max_partition_rows(salted)
        # Plain: the hot key's ~30% of rows share one partition.
        assert hot_plain >= int(n * hot_share * 0.95), hot_plain
        # Salted: spread over 16 salts -> max partition carries a
        # small multiple of the even share. >=4x improvement is the
        # conservative bound (ideal is ~16x for the hot key).
        assert hot_plain / hot_salted >= 4, (hot_plain, hot_salted)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


# --- baseline JPEG codec (operators/jpeg.py) --------------------------------
def test_jpeg_flat_color_roundtrip_exact():
    """A constant block is pure DC — it must survive quantization
    exactly, in both 4:4:4 and 4:2:0."""
    from gentropy_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    flat = np.full((16, 24, 3), [120, 60, 200], dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(flat, quality=90)), flat
    )
    flat2 = np.full((20, 28, 3), [33, 99, 180], dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(flat2, quality=90, subsample=True))
    assert np.array_equal(out, flat2)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / mse) if mse else np.inf


@pytest.mark.parametrize("subsample,floor", [(False, 45.0), (True, 38.0)])
def test_jpeg_gradient_psnr(subsample, floor):
    from gentropy_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    x = np.linspace(0, 255, 48)
    grad = np.stack(np.meshgrid(x, x), -1).mean(-1)
    img = np.stack([grad, grad[::-1], grad.T], -1).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=90, subsample=subsample))
    assert dec.shape == img.shape
    assert _psnr(dec, img) >= floor


def test_jpeg_noise_gray_and_odd_dims():
    from gentropy_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_pixels,
        encode_jpeg,
    )

    noise = _rng(5).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(noise, quality=95))
    assert dec.shape == noise.shape
    assert _psnr(dec, noise) >= 30.0  # worst-case content at q=95

    g = _rng(6).integers(0, 256, (17, 31), dtype=np.uint8)
    meta = decode_jpeg(encode_jpeg(g, quality=90))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (31, 17, 1)

    odd = _rng(7).integers(0, 256, (13, 11, 3), dtype=np.uint8)
    assert decode_jpeg_pixels(encode_jpeg(odd, quality=85)).shape == (13, 11, 3)


def test_jpeg_unsupported_and_corrupt_fall_back_to_stub():
    """Lossless SOF3 and truncated scans route to the stub through
    decode_any; baseline and progressive decode for real."""
    from gentropy_spark.operators.codecs import decode_any
    from gentropy_spark.operators.jpeg import encode_jpeg

    good = encode_jpeg(np.full((8, 8, 3), 77, np.uint8))
    meta = decode_any(good)
    assert meta["codec"] == "jpeg" and meta["mean_value"] == pytest.approx(77.0)

    # a baseline stream relabeled SOF2 is a valid single-full-band
    # progressive frame — the r9 progressive decoder handles it
    prog = bytearray(good)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_any(bytes(prog))["codec"] == "jpeg"

    # flip to SOF3 (lossless, genuinely unsupported) → stub
    lossless = bytearray(good)
    lossless[idx + 1] = 0xC3
    assert decode_any(bytes(lossless))["codec"] == "stub"

    assert decode_any(good[: len(good) // 2])["codec"] == "stub"


# --- progressive JPEG (SOF2) -------------------------------------------------
def test_jpeg_progressive_identical_to_baseline():
    """Successive approximation ending at Al=0 is lossless over the
    quantized coefficients, so progressive and baseline encodings of
    the same image must decode to byte-identical pixels."""
    from gentropy_spark.operators.jpeg import (
        decode_jpeg_pixels, encode_jpeg, encode_jpeg_progressive)

    for shape, sub in [((33, 29, 3), False), ((16, 16), False),
                       ((40, 37, 3), True), ((64, 48), False)]:
        px = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
        b = decode_jpeg_pixels(encode_jpeg(px, quality=88, subsample=sub))
        p = decode_jpeg_pixels(
            encode_jpeg_progressive(px, quality=88, subsample=sub)
        )
        assert np.array_equal(b, p), f"{shape} sub={sub}"


def test_jpeg_progressive_flat_exact_and_decode_any():
    from gentropy_spark.operators.codecs import decode_any
    from gentropy_spark.operators.jpeg import (
        decode_jpeg_pixels, encode_jpeg_progressive)

    flat = np.full((24, 24, 3), 130, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg_progressive(flat, quality=90)), flat
    )
    meta = decode_any(encode_jpeg_progressive(flat, quality=90))
    assert meta["codec"] == "jpeg"
    assert meta["mean_value"] == pytest.approx(130.0)


def test_jpeg_progressive_randomized_content():
    """Randomized sizes / content classes / scan scripts: impulse and
    checkerboard images produce the sparse spectra that drive long
    zero runs (EOB folding, refinement ZRL) — every decode must equal
    the baseline decode bit-for-bit."""
    from gentropy_spark.operators.jpeg import (
        decode_jpeg_pixels, encode_jpeg, encode_jpeg_progressive)

    rng = _rng(123)
    for trial in range(16):
        kind = trial % 3
        h, w = int(rng.integers(8, 60)), int(rng.integers(8, 60))
        color = bool(rng.integers(0, 2))
        sub = color and bool(rng.integers(0, 2))
        shape = (h, w, 3) if color else (h, w)
        if kind == 0:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        elif kind == 1:
            px = np.full(shape, 128, dtype=np.uint8)
            for _ in range(int(rng.integers(1, 6))):
                px[int(rng.integers(0, h)), int(rng.integers(0, w))] = (
                    rng.integers(0, 256)
                )
        else:
            base = (
                ((np.arange(h)[:, None] // 4 + np.arange(w)[None, :] // 4)
                 % 2) * 255
            ).astype(np.uint8)
            px = np.stack([base] * 3, axis=-1) if color else base
        q = int(rng.integers(60, 96))
        kw = dict(
            dc_al=int(rng.integers(0, 3)),
            ac_al=int(rng.integers(0, 4)),
            band_split=int(rng.integers(1, 63)),
        )
        b = decode_jpeg_pixels(encode_jpeg(px, quality=q, subsample=sub))
        p = decode_jpeg_pixels(
            encode_jpeg_progressive(px, quality=q, subsample=sub, **kw)
        )
        assert np.array_equal(b, p), (trial, shape, sub, q, kw)


def test_jpeg_progressive_scan_scripts():
    """Deeper approximation ladders and other band splits decode
    identically — more refinement scans, same coefficients."""
    from gentropy_spark.operators.jpeg import (
        decode_jpeg_pixels, encode_jpeg, encode_jpeg_progressive)

    px = _rng(77).integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    b = decode_jpeg_pixels(encode_jpeg(px, quality=85))
    for kw in (dict(dc_al=2, ac_al=3, band_split=2),
               dict(dc_al=0, ac_al=1, band_split=20),
               dict(dc_al=1, ac_al=2, band_split=62)):
        p = decode_jpeg_pixels(
            encode_jpeg_progressive(px, quality=85, **kw)
        )
        assert np.array_equal(b, p), kw


def test_jpeg_through_mapinpandas_pipeline(spark):
    from gentropy_spark.operators.jpeg import encode_jpeg
    from gentropy_spark.operators.multimodal import decode_features

    px = _rng(9).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(px, quality=95)))],
        "doc_id long, payload binary",
    )
    row = decode_features(df).collect()[0]
    assert row.codec == "jpeg"
    assert (row.width, row.height, row.n_channels) == (8, 8, 3)
    assert row.mean_value == pytest.approx(float(px.mean()), abs=3.0)


# --- MP4 / ISO-BMFF container metadata --------------------------------------
def test_mp4_container_metadata_parses():
    from gentropy_spark.operators.codecs import decode_any, encode_mp4_skeleton

    m = decode_any(encode_mp4_skeleton(1280, 720, 90000, n_tracks=2))
    assert m["codec"] == "mp4"
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["n_channels"] == 2  # track count
    assert m["sample_rate"] == 90000  # movie timescale
    assert m["mean_value"] is None  # sample data intentionally undecoded


def test_mp4_truncated_falls_back_to_stub():
    from gentropy_spark.operators.codecs import decode_any, encode_mp4_skeleton

    payload = encode_mp4_skeleton()
    assert decode_any(payload[:40])["codec"] == "stub"
    # valid ftyp but no moov
    assert decode_any(payload[:24])["codec"] == "stub"


def test_mp4_through_mapinpandas_pipeline(spark):
    from gentropy_spark.operators.codecs import encode_mp4_skeleton
    from gentropy_spark.operators.multimodal import decode_features

    df = spark.createDataFrame(
        [(1, bytearray(encode_mp4_skeleton(640, 360, 1000, 1)))],
        "doc_id long, payload binary",
    )
    row = decode_features(df).collect()[0]
    assert row.codec == "mp4" and (row.width, row.height) == (640, 360)
    assert row.mean_value is None


# --- static assets: Ensembl consequence table --------------------------------
def test_variant_consequence_asset_reference_doctests():
    """The reference's own doctest fixtures
    (assets/variant_consequences.py): missense id/score, table size."""
    from gentropy_spark.assets.variant_consequences import (
        CONSEQUENCES,
        map_score,
        map_sequence_ontology,
    )

    so = map_sequence_ontology()
    assert so["missense_variant"] == "SO_0001583"
    assert len(so) == 41
    assert map_score()["missense_variant"] == 0.68
    # ranks are a dense 1..41 permutation-free sequence, impacts valid
    assert [c.rank for c in CONSEQUENCES] == list(range(1, 42))
    assert {c.impact for c in CONSEQUENCES} == {
        "HIGH", "MODERATE", "LOW", "MODIFIER"
    }
    # the correct public Ensembl term (the reference file carries a
    # find-and-replace typo here)
    assert so["incomplete_terminal_codon_variant"] == "SO_0001626"


# --- Ensembl REST client (offline, injectable transport) --------------------
def test_ensembl_rsid_client_parses_and_batches():
    from gentropy_spark.sources.ensembl_api import fetch_coordinates_from_rsids

    calls = []

    def fake_transport(batch):
        calls.append(list(batch))
        return {
            rsid: {
                "mappings": [
                    {  # canonical chromosome: kept, two alts -> two ids
                        "seq_region_name": "17",
                        "start": 7041768,
                        "allele_string": "G/C/T",
                    },
                    {  # patch scaffold: dropped
                        "seq_region_name": "HSCHR17_1_CTG1",
                        "start": 1,
                        "allele_string": "G/C",
                    },
                ]
            }
            if rsid != "rs_unmapped"
            else {"mappings": []}
            for rsid in batch
        }

    rsids = [f"rs{i}" for i in range(5)] + ["rs_unmapped"]
    got = fetch_coordinates_from_rsids(
        rsids, batch_size=2, pause_time=0, transport=fake_transport
    )
    assert len(calls) == 3  # ceil(6/2) batches
    assert got["rs0"] == ["17_7041768_G_C", "17_7041768_G_T"]
    assert "rs_unmapped" not in got  # no-mapping rsIDs omitted


def test_ensembl_rsid_client_wraps_batch_errors():
    from gentropy_spark.sources.ensembl_api import fetch_coordinates_from_rsids

    def boom(batch):
        raise ConnectionError("offline")

    with pytest.raises(RuntimeError, match="batch 1"):
        fetch_coordinates_from_rsids(["rs1"], transport=boom)


# --- cloud store wiring (sources/cloud.py) ----------------------------------
def test_s3_config_from_file_env_and_conf(tmp_path, monkeypatch):
    from gentropy_spark.sources.cloud import S3Config

    cfg_path = tmp_path / "s3.json"
    cfg_path.write_text(
        '{"bucket_name": "b", "s3_host_port": 9000,'
        ' "s3_host_url": "s3.local", "access_key_id": "ak",'
        ' "secret_access_key": "sk"}'
    )
    cfg = S3Config.from_file(str(cfg_path))
    assert cfg.bucket_name == "b" and cfg.endpoint == "s3.local:9000"
    assert cfg.bucket_uri("data/x.parquet") == "s3a://b/data/x.parquet"
    conf = cfg.hadoop_conf()
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "s3.local:9000"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"

    monkeypatch.setenv("AWS_S3_BUCKET_NAME", "envb")
    monkeypatch.setenv("AWS_ENDPOINT_URL", "s3.example.com:9001")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "id")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sec")
    env_cfg = S3Config.from_env()
    assert (env_cfg.bucket_name, env_cfg.s3_host_port) == ("envb", 9001)

    monkeypatch.delenv("AWS_S3_BUCKET_NAME")
    with pytest.raises(ValueError, match="AWS_S3_BUCKET_NAME"):
        S3Config.from_env()


# --- randomized codec round trips (hypothesis) ------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CODEC_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@_CODEC_SETTINGS
def test_png_roundtrip_property(h, w, channels, seed):
    """PNG is lossless: any size x channel-count round-trips to the
    exact mean (filters cycle per row, so all five paths run)."""
    from gentropy_spark.operators.codecs import decode_png, encode_png

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    meta = decode_png(encode_png(px, color_type=ctype))
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["n_channels"] == channels
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    quality=st.integers(min_value=70, max_value=100),
    subsample=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@_CODEC_SETTINGS
def test_jpeg_roundtrip_property(h, w, quality, subsample, seed):
    """Baseline JPEG at q>=70: dims/channels exact for any size
    (including non-multiple-of-8 and 1-pixel edges), mean within a
    loose lossy tolerance, every pixel within quantization reach."""
    from gentropy_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
    dec = decode_jpeg_pixels(
        encode_jpeg(px, quality=quality, subsample=subsample)
    )
    assert dec.shape == (h, w, 3)
    assert abs(float(dec.mean()) - float(px.mean())) < 48.0


# --- review r9b: EOI-stripped files decode (implicit EOI at EOF) ----------
def test_jpeg_eoi_stripped_decodes_identically():
    """In-the-wild JPEGs are commonly truncated right after the last
    scan's entropy data; EOF must act as an implicit EOI for both
    baseline and progressive streams (review finding r9b)."""
    from gentropy_spark.operators.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    px = _rng(11).integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        b = enc(px)
        assert b.endswith(b"\xff\xd9")
        assert (decode_jpeg_pixels(b[:-2]) == decode_jpeg_pixels(b)).all()
    # headerless / scanless garbage must still fail loudly
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xdb\x00\x04\x00\x00")


# --- GIF codec (r9b): LZW decode + interlace + multi-frame ----------------
def test_gif_gray_and_color_roundtrip():
    from gentropy_spark.operators.gif import (
        decode_gif,
        decode_gif_pixels,
        encode_gif,
    )

    g = _rng(5).integers(0, 256, size=(13, 9), dtype=np.uint8)
    b = encode_gif(g)
    px = decode_gif_pixels(b)
    assert (px[:, :, 0] == g).all() and (px[:, :, 2] == g).all()
    meta = decode_gif(b)
    assert meta["codec"] == "gif"
    assert (meta["width"], meta["height"], meta["n_frames"]) == (9, 13, 1)
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


def test_gif_interlaced_and_clear_spans():
    from gentropy_spark.operators.gif import decode_gif_pixels, encode_gif

    rng = _rng(6)
    colors = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    c = colors[rng.integers(0, 7, size=(21, 17))]
    assert (decode_gif_pixels(encode_gif(c, interlace=True)) == c).all()
    # large image forces multiple CLEAR spans in the literal encoder
    big = colors[rng.integers(0, 7, size=(64, 61))]
    assert (decode_gif_pixels(encode_gif(big)) == big).all()


def test_gif_through_decode_any_and_corrupt_fallback():
    from gentropy_spark.operators.codecs import decode_any
    from gentropy_spark.operators.gif import encode_gif

    g = _rng(7).integers(0, 256, size=(8, 8), dtype=np.uint8)
    meta = decode_any(encode_gif(g))
    assert meta["codec"] == "gif"
    assert meta["width"] == 8 and meta["n_channels"] == 3
    # truncated payload routes to the stub, never raises
    assert decode_any(encode_gif(g)[:20])["codec"] == "stub"


def test_gif_too_many_colors_raises():
    from gentropy_spark.operators.gif import encode_gif

    rgb = _rng(8).integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_gif(rgb)  # ~1024 distinct colors


# --- PNG Adam7 interlace (r9b) --------------------------------------------
@pytest.mark.parametrize(
    "color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)]
)
def test_png_adam7_pixel_exact(color_type, channels):
    """Interlaced encode → decode reassembles the EXACT pixel array
    (checked byte-level through the decompressed pass data)."""
    import zlib

    from gentropy_spark.operators.codecs import (
        _adam7_reassemble,
        _png_chunks,
        encode_png,
    )

    shape = (13, 9, channels) if channels > 1 else (13, 9)
    px = _rng(color_type).integers(0, 256, size=shape, dtype=np.uint8)
    b = encode_png(px, color_type=color_type, filter_type=None, interlace=True)
    idat = b"".join(d for t, d in _png_chunks(b) if t == b"IDAT")
    out = _adam7_reassemble(zlib.decompress(idat), 9, 13, channels)
    assert (out.reshape(px.shape) == px).all()


@pytest.mark.parametrize("h,w", [(1, 1), (9, 1), (1, 9), (4, 4), (33, 31)])
def test_png_adam7_edge_dims(h, w):
    """Dims smaller than the pass grid leave some passes empty; the
    decode must still see every pixel exactly once."""
    from gentropy_spark.operators.codecs import decode_png, encode_png

    px = _rng(h * 100 + w).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    meta = decode_png(encode_png(px, interlace=True))
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


def test_png_adam7_through_decode_any():
    from gentropy_spark.operators.codecs import decode_any, encode_png

    px = _rng(3).integers(0, 256, size=(16, 11, 3), dtype=np.uint8)
    meta = decode_any(encode_png(px, interlace=True))
    assert meta["codec"] == "png"
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


# --- GIF dictionary-LZW compressor (r9b) ----------------------------------
def test_gif_compressed_roundtrip_width_growth():
    """The dictionary compressor exercises the decoder's variable
    code-width growth (9→12 bits), which the literal-only encoder
    never reaches."""
    from gentropy_spark.operators.gif import decode_gif_pixels, encode_gif

    r = _rng(21)
    colors = r.integers(0, 256, size=(17, 3), dtype=np.uint8)
    img = colors[r.integers(0, 17, size=(123, 77))]
    b = encode_gif(img, compress=True)
    assert (decode_gif_pixels(b) == img).all()
    # repetitive content compresses well below the literal stream
    rep = np.tile(np.arange(16, dtype=np.uint8).repeat(50), 128).reshape(
        -1, 100
    )
    bc = encode_gif(rep, compress=True)
    bl = encode_gif(rep, compress=False)
    assert len(bc) < len(bl) / 2
    assert (decode_gif_pixels(bc)[:, :, 0] == rep).all()


def test_gif_compressed_dictionary_reset():
    """400x300 repetitive image overflows the 4096-code table, forcing
    the mid-stream CLEAR + rebuild path on both sides."""
    from gentropy_spark.operators.gif import decode_gif_pixels, encode_gif

    rep = np.tile(np.arange(16, dtype=np.uint8).repeat(50), 300)[
        :120000
    ].reshape(400, 300)
    assert (
        decode_gif_pixels(encode_gif(rep, compress=True))[:, :, 0] == rep
    ).all()


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ncolors=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
    compress=st.booleans(),
    interlace=st.booleans(),
)
def test_gif_roundtrip_property(h, w, ncolors, seed, compress, interlace):
    from gentropy_spark.operators.gif import decode_gif_pixels, encode_gif

    r = np.random.default_rng(seed)
    colors = r.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = colors[r.integers(0, ncolors, size=(h, w))]
    b = encode_gif(img, compress=compress, interlace=interlace)
    assert (decode_gif_pixels(b) == img).all()


# --- 16-bit PNG / PPM depth support (r9b) ---------------------------------
@pytest.mark.parametrize(
    "color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)]
)
@pytest.mark.parametrize("interlace", [False, True])
def test_png_16bit_roundtrip(color_type, channels, interlace):
    from gentropy_spark.operators.codecs import decode_png, encode_png

    shape = (11, 7, channels) if channels > 1 else (11, 7)
    px = _rng(color_type + interlace).integers(
        0, 65536, size=shape, dtype=np.uint16
    )
    meta = decode_png(
        encode_png(px, color_type=color_type, interlace=interlace)
    )
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


def test_ppm_16bit_big_endian():
    from gentropy_spark.operators.codecs import decode_ppm

    px = _rng(30).integers(0, 65536, size=(5, 4, 3), dtype=np.uint16)
    payload = b"P6\n4 5\n65535\n" + px.astype(">u2").tobytes()
    meta = decode_ppm(payload)
    assert meta["codec"] == "ppm"
    assert (meta["width"], meta["height"]) == (4, 5)
    assert meta["mean_value"] == pytest.approx(float(px.mean()))


def test_multimodal_stub_ledger_contract():
    """r11 (verdict #9): the two DECLARED codec stubs — arithmetic-coded
    JPEG and raw H.264 pixel data — must keep their NULL-metadata
    contract: decode_any returns codec='stub' with every metadata field
    NULL (never a fabricated decode), and MP4/H.264 containers return
    real box metadata with mean_value NULL (sample data not decoded)."""
    import struct

    from gentropy_spark.operators.codecs import decode_any, decode_mp4

    # Arithmetic-coded JPEG: SOI + SOF9 (extended sequential,
    # arithmetic coding) frame header. decode_jpeg must raise and
    # decode_any must land on the stub contract.
    sof9 = (
        b"\xff\xd8"  # SOI
        + b"\xff\xc9" + struct.pack(">H", 11)  # SOF9, len
        + bytes([8])  # precision
        + struct.pack(">HH", 4, 4)  # h, w
        + bytes([1, 1, 0x11, 0])  # 1 component
        + b"\xff\xd9"  # EOI
    )
    out = decode_any(sof9)
    assert out["codec"] == "stub"
    assert all(
        out[k] is None
        for k in ("width", "height", "n_channels", "sample_rate", "mean_value")
    )

    # Raw Annex-B H.264 byte stream (start code + SPS NAL): no
    # container, must be the stub — never a fake pixel decode.
    annexb = b"\x00\x00\x00\x01\x67" + bytes(32)
    out = decode_any(annexb)
    assert out["codec"] == "stub"
    assert out["mean_value"] is None

    # H.264 inside MP4: box metadata is real (dims from tkhd), but
    # mean_value stays NULL — the pixel decode is the declared stub.
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(
        b"mvhd",
        bytes(1) + bytes(3) + bytes(8) + struct.pack(">I", 1000) + bytes(84),
    )
    tkhd_body = bytes(1) + bytes(3) + bytes(76) + struct.pack(
        ">II", 64 << 16, 48 << 16
    )
    trak = box(b"trak", box(b"tkhd", tkhd_body))
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00isomavc1") + box(
        b"moov", mvhd + trak
    )
    out = decode_mp4(payload)
    assert out["codec"] == "mp4"
    assert out["width"] == 64 and out["height"] == 48
    assert out["mean_value"] is None
