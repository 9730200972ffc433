"""Tests for helpers, region parsing, writers, and the typed dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gentropy_spark.datasets.base import SchemaValidationError, TypedDataset
from gentropy_spark.functions.genomic_region import GenomicRegion, parse_region_col
from gentropy_spark.functions.helpers import (
    clean_strings_from_symbols,
    get_record_with_maximum_value,
    map_column_by_dictionary,
    nullify_empty_array,
    order_array_of_structs_by_field,
    safe_array_union,
    string2camelcase,
)
from gentropy_spark.sources.writers import read_csv_quarantine, write_partitioned


def test_string2camelcase():
    """Mirrors spark.py:218 doctests."""
    assert string2camelcase("hello_world") == "helloWorld"
    assert string2camelcase("hello-world data") == "helloWorldData"
    with pytest.raises(ValueError):
        string2camelcase("")


def test_map_and_clean_and_nullify(spark):
    df = spark.createDataFrame([("a", []), ("b", [1]), ("Zz!x", [2])], ["k", "arr"])
    out = df.select(
        map_column_by_dictionary(F.col("k"), {"a": "alpha", "b": "beta"}).alias("m"),
        clean_strings_from_symbols(F.col("k")).alias("c"),
        nullify_empty_array(F.col("arr")).alias("n"),
    ).collect()
    assert [r.m for r in out] == ["alpha", "beta", None]
    assert out[2].c == "zz_x"
    assert out[0].n is None and out[1].n == [1]


def test_order_array_of_structs(spark):
    df = spark.createDataFrame(
        [([{"v": 1.0, "id": "a"}, {"v": None, "id": "n"}, {"v": 3.0, "id": "b"}],)],
        T.StructType(
            [
                T.StructField(
                    "arr",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("v", T.DoubleType()),
                                T.StructField("id", T.StringType()),
                            ]
                        )
                    ),
                )
            ]
        ),
    )
    r = df.select(
        order_array_of_structs_by_field(F.col("arr"), "v").alias("s")
    ).first()
    assert [x["id"] for x in r.s] == ["b", "a", "n"]  # desc, nulls last


def test_safe_array_union(spark):
    df = spark.createDataFrame(
        [([1, 2], [2, 3]), (None, [4]), ([5], None)],
        T.StructType(
            [
                T.StructField("a", T.ArrayType(T.IntegerType())),
                T.StructField("b", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    out = [r.u for r in df.select(safe_array_union(F.col("a"), F.col("b")).alias("u")).collect()]
    assert out == [[1, 2, 3], [4], [5]]


def test_get_record_with_maximum_value(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 30.0), ("g", 3, 30.0), ("h", 4, 5.0)],
        ["grp", "id", "v"],
    )
    out = get_record_with_maximum_value(df, ["grp"], "v", "id").collect()
    assert {(r.grp, r.id) for r in out} == {("g", 2), ("h", 4)}


def test_genomic_region_parse_and_overlap(spark):
    r = GenomicRegion.parse("chr1:100-200")
    assert (r.contig, r.start, r.end, r.length()) == ("chr1", 100, 200, 101)
    assert r.overlaps(GenomicRegion.parse("chr1:150-300"))
    assert not r.overlaps(GenomicRegion.parse("chr2:150-300"))
    with pytest.raises(ValueError):
        GenomicRegion.parse("chr1:200-100")

    df = spark.createDataFrame([("chr2:5-9",), ("bogus",)], ["spec"])
    rows = df.select(*parse_region_col(F.col("spec"))).collect()
    assert (rows[0].contig, rows[0].region_start, rows[0].region_end) == ("chr2", 5, 9)
    assert rows[1].contig is None


def test_write_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(c, p, float(p)) for c in ("a", "b") for p in range(20)],
        ["contig", "pos", "v"],
    )
    path = str(tmp_path / "out")
    write_partitioned(df, path, ["contig"], ["pos"], num_partitions=2)
    back = spark.read.parquet(path)
    assert back.count() == 40
    # partition pruning works on the layout
    pruned = back.filter(F.col("contig") == "a")
    assert pruned.count() == 20
    files = {r[0] for r in pruned.select(F.input_file_name()).collect()}
    assert all("contig=a" in f for f in files)


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,2.0\n2,notanumber\n3,4.5\n")
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("v", T.DoubleType())]
    )
    df = read_csv_quarantine(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1


def test_typed_dataset_validation_and_flags(spark):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    df = spark.createDataFrame([(1, 2.0), (2, -1.0)], schema)
    ds = TypedDataset(df, schema, "demo")
    flagged = ds.flag("qualityControls", F.col("v") < 0, "NEGATIVE")
    rows = {r.id: r.qualityControls for r in flagged.df.collect()}
    assert rows[1] == [] and rows[2] == ["NEGATIVE"]
    assert flagged.valid_rows().count() == 1

    with pytest.raises(SchemaValidationError):
        TypedDataset(df.drop("v"), schema, "demo")
    with pytest.raises(SchemaValidationError):
        TypedDataset(df.withColumn("v", F.col("v").cast("string")), schema, "demo")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Same-bucketed tables must sort-merge join with zero Exchange."""
    from gentropy_spark.sources.writers import write_bucketed

    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    write_bucketed(a, "bt_a", ["id"], num_buckets=4, sort_cols=["id"])
    write_bucketed(b, "bt_b", ["id"], num_buckets=4, sort_cols=["id"])
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), on="id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        import re

        assert not re.findall(r"\(\d+\) Exchange", plan), plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_stream_checkpoint_idempotent(spark, sf_dir, tmp_path):
    """A second availableNow drain over the same checkpoint must not
    reprocess (exactly-once file-source semantics)."""
    from gentropy_spark.streaming.windowed import windowed_event_agg

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt")

    def drain(name):
        from gentropy_spark.sources.readers import normalize_events_ts

        stream = normalize_events_ts(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        q = (
            windowed_event_agg(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q.lastProgress

    drain("ckpt_run1")
    first = spark.table("ckpt_run1").count()
    assert first > 0
    progress = drain("ckpt_run2")
    # no new files -> second drain reads zero input rows
    assert progress is None or progress["numInputRows"] == 0


def test_cli_list_and_run(capsys):
    from gentropy_spark.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "window_clump_leads\toracle" in out
    assert main(["run", "nonexistent_query"]) == 2


def test_sessionize_multibatch_no_split(spark, sf_dir, tmp_path):
    """r2 defect: the sessionizer flushed open state every micro-batch,
    splitting sessions at batch boundaries. Split the events table into
    three time-ordered files and drain one file per trigger: sessions
    spanning batch boundaries must come out whole, matching the
    watermark-aware single-batch result."""
    import tempfile

    from pyspark.sql import functions as F

    from gentropy_spark.sources.readers import normalize_events_ts, read_table
    from gentropy_spark.streaming.windowed import sessionize_stateful

    events = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    # Three chronological chunks as separate files (lexicographic file
    # order == time order, which is how the file source picks batches).
    qs = events.approxQuantile("ts_us", [0.33, 0.66], 0.001)
    src = tmp_path / "events_split"
    for i, (lo, hi) in enumerate(
        [(None, qs[0]), (qs[0], qs[1]), (qs[1], None)]
    ):
        part = events
        if lo is not None:
            part = part.filter(F.col("ts_us") > lo)
        if hi is not None:
            part = part.filter(F.col("ts_us") <= hi)
        part = part.drop("ts_us")
        part.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
    paths = sorted(str(p) for p in src.glob("b*/part-*.parquet"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, p in enumerate(paths):
        import os
        import shutil
        import time

        dst = flat / f"{i:03d}.parquet"
        shutil.copy(p, dst)
        # The file source orders batches by MODIFICATION TIME; quick
        # successive copies tie on mtime and can reorder, making every
        # chronologically-earlier file watermark-late. Space them out.
        t = time.time() + i * 60
        os.utime(dst, (t, t))

    schema = spark.read.parquet(str(flat)).schema
    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(flat))
    )
    out = sessionize_stateful(stream)
    ckpt = tempfile.mkdtemp(prefix="gentropy_spark_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_multibatch")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    multi = {tuple(r) for r in spark.table("sess_multibatch").collect()}

    from gentropy_spark.streaming.windowed import run_sessionize_available_now

    single = {
        tuple(r)
        for r in run_sessionize_available_now(
            spark, sf_dir, "sess_singlebatch"
        ).collect()
    }
    assert multi == single


def test_canonical_schema_validation(spark):
    """Recursive schema comparison with the reference's issue taxonomy
    (duplicates / missing-mandatory / unexpected / type-mismatch,
    nested struct+array recursion) against the canonical registry."""
    from pyspark.sql import types as T

    from gentropy_spark.datasets.schemas import (
        CANONICAL,
        compare_structs,
        is_fatal,
        validate_against,
    )

    good = CANONICAL["sumstats"][1]
    assert validate_against(good, "sumstats") == {}

    # drop a mandatory column, retype another, add an extra
    observed = T.StructType(
        [
            T.StructField("point_id", T.LongType()),
            T.StructField("study_id", T.StringType()),  # wrong type
            T.StructField("contig", T.StringType()),
            T.StructField("pos", T.LongType()),
            T.StructField("extra", T.DoubleType()),  # unexpected
        ]
    )  # signif missing
    issues = validate_against(observed, "sumstats")
    assert issues["missing_mandatory_columns"] == ["signif"]
    assert any("study_id" in s for s in issues["columns_with_non_matching_type"])
    assert issues["unexpected_columns"] == ["extra"]
    assert is_fatal(issues)
    assert not is_fatal({"unexpected_columns": ["x"]})

    # nested recursion: array<struct> element mismatch is located
    exp = T.StructType(
        [
            T.StructField(
                "loci",
                T.ArrayType(
                    T.StructType([T.StructField("pp", T.DoubleType(), False)])
                ),
                False,
            )
        ]
    )
    obs = T.StructType(
        [
            T.StructField(
                "loci",
                T.ArrayType(
                    T.StructType([T.StructField("pp", T.StringType(), False)])
                ),
            )
        ]
    )
    nested = dict(compare_structs(obs, exp))
    assert any("loci[].pp" in s for s in nested["columns_with_non_matching_type"])


def test_cli_dag_topo_and_dry_run(tmp_path, capsys):
    """Step DAG: deterministic topological order, cycle and
    unknown-dependency errors, dry-run planning."""
    import json

    import pytest

    from gentropy_spark.cli import main, topo_order

    assert topo_order(
        {
            "c": {"after": ["a", "b"]},
            "b": {"after": ["a"]},
            "a": {},
            "d": {},
        }
    ) == ["a", "b", "c", "d"]
    with pytest.raises(ValueError, match="cycle"):
        topo_order({"a": {"after": ["b"]}, "b": {"after": ["a"]}})
    with pytest.raises(ValueError, match="unknown"):
        topo_order({"a": {"after": ["ghost"]}})

    cfg = {
        "sf_dir": "/root/testdata/sf0.001",
        "out_dir": str(tmp_path / "out"),
        "steps": {
            "clump": {"query": "window_clump_leads"},
            "pics": {"query": "pics_finemap", "after": ["clump"]},
        },
    }
    cfg_path = tmp_path / "pipeline.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["dag", "--config", str(cfg_path), "--dry-run"]) == 0
    assert capsys.readouterr().out.strip() == "clump -> pics"
    # bad query name is rejected up front
    cfg["steps"]["pics"]["query"] = "nope"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["dag", "--config", str(cfg_path), "--dry-run"]) == 2


def test_cli_dag_executes(tmp_path, spark):
    """The DAG runner writes one parquet per step in dependency order."""
    import json

    from gentropy_spark.cli import run_dag

    out_dir = tmp_path / "pipe"
    cfg = {
        "sf_dir": "/root/testdata/sf0.001",
        "out_dir": str(out_dir),
        "steps": {
            "clump": {"query": "window_clump_leads"},
            "qc": {"query": "qc_gc_lambda", "after": ["clump"]},
        },
    }
    cfg_path = tmp_path / "pipeline.json"
    cfg_path.write_text(json.dumps(cfg))
    order = run_dag(str(cfg_path))
    assert order == ["clump", "qc"]
    for step in order:
        files = list((out_dir / step).glob("*.parquet"))
        assert files, f"no parquet written for {step}"


def test_stream_watermark_drops_late_file(spark, sf_dir, tmp_path):
    """Watermark semantics demonstrated end-to-end: a file whose events
    are entirely older than the advanced watermark arrives late and is
    DROPPED by the stateful sessionizer (counted in the progress
    metrics). Spark's late-event filter uses the watermark as of one
    batch earlier, so the scenario needs THREE chronological batches:
    two fresh files (the second commits the first's watermark for
    filtering), then the stale file."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from gentropy_spark.sources.readers import normalize_events_ts, read_table
    from gentropy_spark.streaming.windowed import sessionize_stateful

    events = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    mid, q90 = events.approxQuantile("ts_us", [0.5, 0.9], 0.001)
    new_a = events.filter(
        (F.col("ts_us") > mid) & (F.col("ts_us") <= q90)
    ).drop("ts_us")
    new_b = events.filter(F.col("ts_us") > q90).drop("ts_us")
    old_part = events.filter(F.col("ts_us") <= mid).drop("ts_us")
    src = tmp_path / "late_src"
    src.mkdir()
    t0 = time.time()
    for i, part in enumerate([new_a, new_b, old_part]):
        part.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"chunk{i}")
        )
        f = next((tmp_path / f"chunk{i}").glob("part-*.parquet"))
        dst = src / f"{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 60, t0 + i * 60))

    schema = spark.read.parquet(str(src)).schema
    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    ckpt = tempfile.mkdtemp(prefix="gentropy_spark_ckpt_")
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    n_old = old_part.count()
    assert dropped == n_old, f"expected all {n_old} late rows dropped, got {dropped}"


def test_stream_incremental_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once incremental processing: drain once, add a new file,
    drain again over the SAME checkpoint — the second drain processes
    only the new file and the union equals a batch over both."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from gentropy_spark.sources.readers import read_table
    from gentropy_spark.streaming.windowed import dedup_keys

    events = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    mid = events.approxQuantile("ts_us", [0.5], 0.001)[0]
    first = events.filter(F.col("ts_us") <= mid).drop("ts_us")
    second = events.filter(F.col("ts_us") > mid).drop("ts_us")
    src = tmp_path / "incr_src"
    src.mkdir()
    first.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "f1"))
    f1 = next((tmp_path / "f1").glob("part-*.parquet"))
    t0 = time.time()
    shutil.copy(f1, src / "000.parquet")
    os.utime(src / "000.parquet", (t0, t0))

    ckpt = tempfile.mkdtemp(prefix="gentropy_spark_ckpt_")
    schema = spark.read.parquet(str(src)).schema

    def drain(name):
        from gentropy_spark.sources.readers import normalize_events_ts

        stream = normalize_events_ts(
            spark.readStream.schema(schema).parquet(str(src))
        )
        q = (
            dedup_keys(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    drain("incr_1")
    n1 = spark.table("incr_1").count()
    second.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "f2"))
    f2 = next((tmp_path / "f2").glob("part-*.parquet"))
    shutil.copy(f2, src / "001.parquet")
    os.utime(src / "001.parquet", (t0 + 60, t0 + 60))
    q2 = drain("incr_2")
    # second drain reads ONLY the new file
    new_in = sum(p["numInputRows"] for p in q2.recentProgress)
    assert new_in <= second.count(), "second drain reprocessed old data"
    batch = (
        events.drop("ts_us").withColumn("pos", F.unix_micros(F.col("ts")))
        .groupBy("user_id", "event_type", "pos")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count("*").alias("n_dups"),
        )
    )
    assert spark.table("incr_2").count() == batch.count()
    assert n1 <= batch.count()


def test_range_sorted_writer_has_disjoint_envelopes(spark, sf_dir, tmp_path):
    """write_partitioned must leave each file a tight, non-overlapping
    min/max envelope on the sort key — the property parquet footer
    pruning depends on (checked in the actual footers, not the API)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from gentropy_spark.sources.readers import read_table
    from gentropy_spark.sources.writers import write_partitioned

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = str(tmp_path / "ranged")
    write_partitioned(ev, out, [], ["event_id"], num_partitions=8)
    envelopes = []
    for f in sorted(Path(out).glob("part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        col = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "event_id"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        envelopes.append((min(mins), max(maxs)))
    envelopes.sort()
    assert len(envelopes) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(envelopes, envelopes[1:]):
        assert hi1 < lo2, f"overlapping envelopes {(lo1, hi1)} vs {(lo2, hi2)}"


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from pathlib import Path

    from pyspark.sql import functions as F

    from gentropy_spark.sources.readers import read_table
    from gentropy_spark.sources.writers import compact_parquet

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "frag")
    # fragment: many tiny files
    ev.repartition(37).write.mode("overwrite").parquet(out)
    assert len(list(Path(out).glob("part-*.parquet"))) == 37
    total = ev.count()
    chk = ev.agg(F.sum("event_id")).first()[0]
    n = compact_parquet(spark, out, target_rows_per_file=total // 3, sort_cols=["event_id"])
    assert n <= 4
    back = spark.read.parquet(out)
    assert back.count() == total
    assert back.agg(F.sum("event_id")).first()[0] == chk


def test_synthetic_datasource_deterministic_and_pushdown(spark):
    """The custom Python DataSource must (a) produce identical data at
    any partitioning, (b) honor its row count, (c) filter correctly
    with study_id pushdown."""
    from pyspark.sql import functions as F

    from gentropy_spark.sources.synthetic import SyntheticSumstatsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticSumstatsDataSource)
    a = (
        spark.read.format("synthetic_sumstats")
        .option("n_rows", 5000).option("n_partitions", 4).load()
    )
    b = (
        spark.read.format("synthetic_sumstats")
        .option("n_rows", 5000).option("n_partitions", 13).load()
    )
    assert a.count() == 5000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    got = (
        a.filter(F.col("study_id") == 7)
        .agg(F.count("*"), F.sum("pos")).first()
    )
    want = (
        b.filter(F.col("study_id") == 7)
        .agg(F.count("*"), F.sum("pos")).first()
    )
    assert tuple(got) == tuple(want) and got[0] == 100


def test_ts_normalization_all_physical_shapes(spark, tmp_path):
    """The r5 regression guard: events.ts has shipped as nanosecond
    longs, tz-adjusted micros, and TIMESTAMP_NTZ micros across driver
    rounds. read_table must yield identical epoch micros — and a
    watermarkable TIMESTAMP — for all three."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gentropy_spark.sources.readers import read_table, ts_micros

    us = [1_704_067_200_000_000 + i * 1_000_000 for i in range(5)]
    ids = list(range(5))
    variants = {
        "ns_long": pa.table(
            {"event_id": ids, "ts": pa.array([u * 1000 for u in us], pa.int64())}
        ),
        "ntz": pa.table(
            {"event_id": ids, "ts": pa.array(us, pa.timestamp("us"))}
        ),
        "utc": pa.table(
            {"event_id": ids, "ts": pa.array(us, pa.timestamp("us", tz="UTC"))}
        ),
    }
    results = {}
    for name, tbl in variants.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet")
        df = read_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        rows = df.select("event_id", ts_micros(df).alias("us")).collect()
        results[name] = sorted((r.event_id, r.us) for r in rows)
    want = sorted(zip(ids, us))
    for name, got in results.items():
        assert got == want, (name, got[:2], want[:2])


def test_operator_at_1m_rows_from_synthetic_source(spark):
    """Scale smoke: window clumping over 1M generated rows straight
    from the custom DataSource (no parquet), result invariant to the
    source partitioning — operators are not tied to file inputs."""
    from gentropy_spark.operators.clumping import window_clump
    from gentropy_spark.sources.synthetic import SyntheticSumstatsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticSumstatsDataSource)

    def leads(n_partitions):
        src = (
            spark.read.format("synthetic_sumstats")
            .option("n_rows", 1_000_000)
            .option("n_partitions", n_partitions)
            .load()
        )
        out = window_clump(
            src, window=50_000_000, min_signif=290.0
        )
        return {
            (r.study_id, r.contig, r.cluster_seq): (r.lead_point_id, r.n_members)
            for r in out.collect()
        }

    a = leads(8)
    b = leads(31)
    assert a and a == b


def test_registry_degrades_per_module(monkeypatch):
    """A plan module that fails to import must cost only its own keys."""
    import importlib

    from gentropy_spark.plans import registry as R

    real = importlib.import_module

    def fake(name, *a, **k):
        if name.endswith(".graph_ld"):
            raise RuntimeError("injected import failure")
        return real(name, *a, **k)

    monkeypatch.setattr(importlib, "import_module", fake)
    reg = R.full_registry()
    assert "ontology_closure" not in reg  # graph_ld key gone
    assert "q1_pricing_summary" in reg  # everything else intact
    assert len(reg) > 100


def test_stream_upsert_sink_incremental(spark, sf_dir, tmp_path):
    """foreachBatch upsert: drain half the data, then all of it over
    the same checkpoint — the parquet target converges to the batch
    ground truth and the second drain only merges the new keys."""
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from gentropy_spark.sources.readers import read_table
    from gentropy_spark.streaming.windowed import run_upsert_sink

    events = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    mid = events.approxQuantile("ts_us", [0.5], 0.001)[0]
    first = events.filter(F.col("ts_us") <= mid).drop("ts_us")
    second = events.filter(F.col("ts_us") > mid).drop("ts_us")
    src = tmp_path / "upsert_src"
    src.mkdir()
    t0 = time.time()
    first.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "u1"))
    shutil.copy(
        next((tmp_path / "u1").glob("part-*.parquet")), src / "events.parquet"
    )
    os.utime(src / "events.parquet", (t0, t0))
    target = str(tmp_path / "upsert_target")
    ckpt = str(tmp_path / "upsert_ckpt")

    run_upsert_sink(spark, str(src), target, ckpt)
    n1 = spark.read.parquet(target).count()
    assert n1 == first.withColumn("pos", F.unix_micros("ts")).groupBy(
        "user_id", "event_type", "pos"
    ).count().count()

    # append the rest as a NEW file, re-drain over the SAME checkpoint
    second.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "u2"))
    shutil.copy(
        next((tmp_path / "u2").glob("part-*.parquet")), src / "events2.parquet"
    )
    os.utime(src / "events2.parquet", (t0 + 60, t0 + 60))
    run_upsert_sink(spark, str(src), target, ckpt)

    got = spark.read.parquet(target)
    want = (
        events.drop("ts_us")
        .withColumn("pos", F.unix_micros("ts"))
        .groupBy("user_id", "event_type", "pos")
        .agg(F.min("event_id").alias("first_event_id"), F.count("*").alias("n_dups"))
    )
    assert got.count() == want.count()
    # every key present; first_event_id matches the batch ground truth
    diff = got.join(
        want.withColumnRenamed("first_event_id", "w_first"),
        on=["user_id", "event_type", "pos"],
    ).filter(F.col("first_event_id") != F.col("w_first"))
    assert diff.count() == 0


def test_plan_cache_identity_and_keying(spark, sf_dir, monkeypatch):
    """Prepared-plan cache (plans/registry.py): pure plan-builder keys
    return the SAME resolved DataFrame for the same (app, sf_dir,
    profile) — and rebuild when the sf_dir or a profile env flag
    changes. Iterative keys (real work inside fn) must NOT be wrapped."""
    from gentropy_spark.plans import full_registry
    from gentropy_spark.plans.registry import _PLAN_CACHE_KEYS

    # Pin a known baseline profile (save/restore via monkeypatch): the
    # test must pass — and not strip the user's flags — when run under
    # the GENTROPY_SPARK_NATIVE_SUMS=1 production profile.
    monkeypatch.delenv("GENTROPY_SPARK_NATIVE_SUMS", raising=False)
    reg = full_registry()
    fn = reg["q3_shipping_priority"].fn
    a = fn(spark, sf_dir)
    assert fn(spark, sf_dir) is a
    # env profile flips the key
    monkeypatch.setenv("GENTROPY_SPARK_NATIVE_SUMS", "1")
    b = fn(spark, sf_dir)
    assert b is not a
    assert fn(spark, sf_dir) is b
    monkeypatch.delenv("GENTROPY_SPARK_NATIVE_SUMS")
    assert fn(spark, sf_dir) is a
    # iterative pipelines are deliberately unwrapped
    for key in ("dedup_clusters", "corpus_curate"):
        assert key not in _PLAN_CACHE_KEYS
        assert not hasattr(reg[key].fn, "__wrapped__")
    # wrapped fns expose the raw builder
    assert hasattr(fn, "__wrapped__")


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prev_round_tail_recovery():
    """bench._prev_bench must recover a usable (spark, duckdb) per-query
    overlap from the latest driver record regardless of its shape:
    parsed-with-duckdb, slim-parsed (duck dict only in BENCH_FULL.json),
    or parsed=null tail reconstruction (r9/r10)."""
    import glob
    import os
    import sys

    root = _repo_root()
    sys.path.insert(0, root)
    import bench

    if not glob.glob(os.path.join(root, "BENCH_r*.json")):
        pytest.skip("no BENCH_r*.json driver records in this checkout")
    prev = bench._prev_bench()
    assert prev is not None
    n, queries, duck, sf, duck_source = prev
    assert n >= 1
    assert duck_source in ("record", "tail_reconstruction") or duck_source.startswith(
        "full_sibling"
    )
    # A slim record with a stale sibling (different sf / key set —
    # e.g. after a local bench run at another sf rewrote
    # BENCH_FULL.json) legitimately yields NO duck pairing; bench then
    # skips the shared-subset comparison. When a pairing IS recovered
    # it must be usable.
    shared = set(queries) & set(duck)
    if duck:
        assert len(shared) >= 20, (len(queries), len(duck))
    # spot-check internal consistency: every recovered spark second is
    # positive and finite
    assert all(v > 0 for k, v in queries.items() if k in shared)
    assert all(v > 0 for v in queries.values())


def test_bench_prev_round_slim_parsed_record(tmp_path, monkeypatch):
    """The r11 breakage class, pinned synthetically: a driver record
    whose parsed payload carries "queries" but NO per-query "duckdb"
    dict (the slim stdout line) must fall back to the sibling
    BENCH_FULL.json — and must NOT trust a stale sibling whose sf or
    key set disagrees."""
    import importlib
    import json
    import sys

    sys.path.insert(0, _repo_root())
    import bench

    q = {f"q{i}": 1.0 + i / 10 for i in range(25)}
    d = {f"q{i}": 0.5 + i / 20 for i in range(25)}
    slim = {
        "n": 1,
        "rc": 0,
        "tail": "x",
        "parsed": {"queries": q, "sf": 0.1, "full": "BENCH_FULL.json"},
    }
    (tmp_path / "BENCH_r99.json").write_text(json.dumps(slim))
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"queries": q, "duckdb": d, "sf": 0.1})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    prev = bench._prev_bench()
    assert prev is not None and prev[0] == 99
    assert prev[1] == q and prev[2] == d and prev[3] == 0.1
    # provenance: the duck dict came from the sibling, and the
    # consistency ratio vs the record's duckdb_total is carried
    assert prev[4].startswith("full_sibling"), prev[4]

    # stale sibling: sf mismatch -> duck dict must come back empty
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"queries": q, "duckdb": d, "sf": 0.01})
    )
    importlib.invalidate_caches()
    prev = bench._prev_bench()
    assert prev is not None and prev[2] == {}

    # stale sibling: disjoint key set -> rejected too
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"queries": q, "duckdb": {"other": 1.0}, "sf": 0.1})
    )
    prev = bench._prev_bench()
    assert prev is not None and prev[2] == {}
