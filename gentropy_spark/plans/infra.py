"""Infra-component promotion queries (r9, verdict item 3).

Five components that were previously proven only by unit tests get
driver-visible registry entries here, each with a deterministic query
shape and (where SQL can express the semantics) a DuckDB oracle:

- ``salted_join`` — the skew-defeating equi-join
  (operators/reshape.py:100) must equal the PLAIN join bit-for-bit;
  the oracle IS the plain SQL join, so the driver hash-proves the
  salting transformation is result-invariant.
- ``compact_parquet`` — the small-files maintenance pass
  (sources/writers.py:92): fragment a copy of ``orders`` into 37
  splits, compact to ~5k-row files sorted by key, then read the
  COMPACTED dataset back and report footer-level facts (file count,
  row count, key checksum, min/max range disjointness). The oracle
  derives the same facts from the source table, so lost/duplicated
  rows or overlapping pruning envelopes hash-fail.
- ``synthetic_sumstats`` — the Python DataSource V2 generator
  (sources/synthetic.py:88) scanned end-to-end; the generator's
  arithmetic is pure, so the oracle regenerates it with a DuckDB
  ``range()`` scan.
- ``upsert_sink_drain`` — the streaming foreachBatch MERGE sink
  (streaming/windowed.py:444) drained with availableNow into a fresh
  parquet target; the final target must equal the batch dedup
  aggregate (same oracle as ``stream_dedup``).
- ``l2g_train_metrics`` — the deterministic GBM trainer
  (operators/l2g_trainer.py:215): frozen-seed-free by construction
  (exact greedy splits over a totally ordered collect), so the
  training metrics row is reproducible; no SQL oracle can train a
  GBM, so this is a rows-only entry like the fine-mapping kernels.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gentropy_spark.plans.registry import QuerySpec
from gentropy_spark.sources.readers import read_table

REGISTRY: dict[str, QuerySpec] = {}


def _scratch_dir(prefix: str) -> str:
    """Temp dir whose lifetime outlives the returned LAZY DataFrame
    (the caller collects later) but not the process — registered for
    atexit cleanup so repeated driver/parity runs don't accumulate."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


# --- A17 promotion: salted join == plain join ------------------------------
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted orders⋈customer on custkey; result must equal plain join."""
    from gentropy_spark.operators.reshape import salted_join

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    return salted_join(orders, customer, key="o_custkey", n_salts=8)


SALTED_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, c_nationkey
FROM orders JOIN customer ON o_custkey = c_custkey
"""


# --- F10 promotion: compaction footer facts ---------------------------------
COMPACT_TARGET_ROWS = 5_000


def q_compact_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment → compact → verify from the compacted files themselves.

    Returns ONE row read back from the POST-compaction dataset:
    file count (must be ceil(rows/target)), row count and key checksum
    (no row lost or duplicated), and whether the per-file
    [min, max] o_orderkey envelopes are pairwise disjoint (the sorted
    compaction restored pruning envelopes). The oracle derives the
    same facts from the source table.
    """
    from gentropy_spark.sources.writers import compact_parquet

    tmp = _scratch_dir("gentropy_compact_")
    path = f"{tmp}/orders"
    read_table(spark, sf_dir, "orders").repartition(37).write.mode(
        "overwrite"
    ).parquet(path)
    compact_parquet(
        spark, path, COMPACT_TARGET_ROWS, sort_cols=["o_orderkey"]
    )
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("o_orderkey").alias("ksum"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
    )
    w = Window.orderBy("mn")
    flags = per_file.withColumn("prev_mx", F.lag("mx").over(w))
    return flags.agg(
        F.count("*").cast("int").alias("n_files"),
        F.sum("cnt").alias("n_rows"),
        F.sum("ksum").alias("key_sum"),
        F.min(
            F.col("prev_mx").isNull() | (F.col("prev_mx") < F.col("mn"))
        ).alias("ranges_disjoint"),
    )


COMPACT_PARQUET_SQL = f"""
SELECT CAST(CEIL(COUNT(*) / {COMPACT_TARGET_ROWS}.0) AS INT) AS n_files,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       TRUE AS ranges_disjoint
FROM orders
"""


# --- F12 promotion: DataSource V2 generator scan ----------------------------
SYNTH_N_ROWS = 20_000


def q_synthetic_sumstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the Python DataSource V2 generator end-to-end (8 splits)."""
    from gentropy_spark.sources.synthetic import SyntheticSumstatsDataSource

    try:
        spark.dataSource.register(SyntheticSumstatsDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    # A pushFilters-capable reader is rejected AT EXECUTION by the
    # Python worker when spark.sql.python.filterPushdown.enabled is
    # false (the driver contract runs a vanilla session where it is).
    # Rather than flipping the shared session conf as a side effect —
    # which would leak into every later query — select the matching
    # reader capability per query from the conf as it already stands.
    conf_key = "spark.sql.python.filterPushdown.enabled"
    pushdown = str(spark.conf.get(conf_key, "false")).lower()
    return (
        spark.read.format("synthetic_sumstats")
        .option("n_rows", SYNTH_N_ROWS)
        .option("n_partitions", 8)
        .option("pushdown", pushdown)
        .load()
    )


# Regenerates sources/synthetic.py:_row arithmetically — same pure
# integer recurrences, so the scan is hash-checkable without parquet.
SYNTHETIC_SUMSTATS_SQL = f"""
SELECT i AS point_id,
       i % 50 AS study_id,
       'chr' || CAST(i % 5 + 1 AS VARCHAR) AS contig,
       1700000000000000 + (i * 7919) % 1000000000 AS pos,
       CAST((i * 2654435761) % 300000 AS DOUBLE) / 1000.0 AS signif
FROM range({SYNTH_N_ROWS}) t(i)
"""


# --- F15 promotion: streaming upsert sink final state -----------------------
def q_upsert_sink_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through the foreachBatch MERGE sink into
    a fresh parquet target; return the final target table. Equal to the
    batch dedup aggregate iff every micro-batch merged exactly once."""
    from gentropy_spark.streaming.windowed import run_upsert_sink

    tmp = _scratch_dir("gentropy_upsert_")
    run_upsert_sink(
        spark, sf_dir, target_dir=f"{tmp}/target", checkpoint=f"{tmp}/ckpt"
    )
    return spark.read.parquet(f"{tmp}/target")


UPSERT_SINK_SQL = """
SELECT user_id, event_type, epoch_us(ts) AS pos,
       MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
FROM events
GROUP BY 1, 2, 3
"""


# --- H37 promotion: deterministic trainer metrics (rows-only) ---------------
def q_l2g_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row training report from the deterministic GBM trainer.

    Reproducible without a seed: splits are exact greedy maximisers
    over a totally ordered (orderBy point/study/gene) collect, so
    reruns are byte-identical. No SQL oracle can express GBM training
    — rows-only entry (same class as the fine-mapping kernels).
    """
    from gentropy_spark.operators.l2g_trainer import train_l2g

    art = train_l2g(spark, sf_dir, n_trees=6, n_folds=3)
    cv_aucs = [c["auc"] for c in art["cv"]]
    row = (
        art["n_rows"],
        art["n_pos"],
        int(art["params"]["n_trees_used"]),
        float(art["train"]["auc"]),
        float(art["train"]["logloss"]),
        float(art["threshold"]),
        round(sum(cv_aucs) / len(cv_aucs), 6) if cv_aucs else None,
        len(cv_aucs),
    )
    return spark.createDataFrame(
        [row],
        "n_rows long, n_pos long, n_trees_used int, train_auc double,"
        " train_logloss double, threshold double, mean_cv_auc double,"
        " n_cv_folds int",
    )


REGISTRY.update(
    {
        "salted_join": QuerySpec(q_salted_join, SALTED_JOIN_SQL),
        "compact_parquet": QuerySpec(q_compact_parquet, COMPACT_PARQUET_SQL),
        "synthetic_sumstats": QuerySpec(
            q_synthetic_sumstats, SYNTHETIC_SUMSTATS_SQL
        ),
        "upsert_sink_drain": QuerySpec(q_upsert_sink_drain, UPSERT_SINK_SQL),
        "l2g_train_metrics": QuerySpec(q_l2g_train_metrics, None),
    }
)
