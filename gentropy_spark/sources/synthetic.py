"""Custom Python DataSource: deterministic synthetic sumstats (SURVEY F12).

Exercises Spark's DataSource V2 Python API (pyspark.sql.datasource —
public since Spark 4): a partition-aware generator source that
produces the engine's summary-statistics shape at ANY requested scale
without parquet inputs. Rows are a pure function of (global row
index), so any two reads — any partition count, any cluster — produce
identical data: the property a scale-testing source needs.

Mirrors the role of the reference's datasource adapters (they read
external APIs; this one manufactures load), re-expressed through the
engine-native extension point:

    spark.dataSource.register(SyntheticSumstatsDataSource)
    df = (spark.read.format("synthetic_sumstats")
          .option("n_rows", 1_000_000)
          .option("n_partitions", 64)
          .load())

Filter pushdown (``pushFilters``) prunes whole partitions when an
equality/range filter on ``study_id`` arrives — the same
partition-elimination contract a parquet scan gives Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql import types as T

N_STUDIES = 50
N_CONTIGS = 5
BASE_POS = 1_700_000_000_000_000


def _row(i: int) -> tuple:
    study = i % N_STUDIES
    contig = f"chr{i % N_CONTIGS + 1}"
    pos = BASE_POS + (i * 7_919) % 1_000_000_000
    # deterministic pseudo-signal in [0, 300)
    signif = float((i * 2_654_435_761) % 300_000) / 1000.0
    return (i, study, contig, pos, signif)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _SyntheticReaderBase(DataSourceReader):
    """Generator reader WITHOUT a pushFilters override.

    Spark's Python worker refuses any reader that overrides
    ``pushFilters`` when ``spark.sql.python.filterPushdown.enabled``
    is false (the driver contract runs a vanilla session where it IS
    false). Splitting the capability into a subclass lets the
    datasource serve both session shapes without mutating session
    conf as a side effect of building one query.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self._study_eq: int | None = None

    def partitions(self) -> Sequence[_Partition]:
        per = max(1, self.n_rows // self.n_partitions)
        parts = []
        start = 0
        while start < self.n_rows:
            parts.append(_Partition(start, min(start + per, self.n_rows)))
            start += per
        return parts

    def read(self, partition: _Partition) -> Iterator[tuple]:
        eq = self._study_eq
        for i in range(partition.start, partition.end):
            if eq is not None and i % N_STUDIES != eq:
                continue
            yield _row(i)


class SyntheticSumstatsReader(_SyntheticReaderBase):
    """Pushdown-capable reader: prunes rows on ``study_id = k``."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("study_id",):
                # handled here (partition pruning in read())
                self._study_eq = int(f.value)
            else:
                yield f  # Spark re-applies what we don't handle


class SyntheticSumstatsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_sumstats"

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("point_id", T.LongType()),
                T.StructField("study_id", T.LongType()),
                T.StructField("contig", T.StringType()),
                T.StructField("pos", T.LongType()),
                T.StructField("signif", T.DoubleType()),
            ]
        )

    def reader(self, schema: T.StructType) -> _SyntheticReaderBase:
        # option("pushdown", "false") selects the capability-free
        # reader so the source loads under sessions where
        # spark.sql.python.filterPushdown.enabled is off (same rows —
        # Spark applies the filters itself, just without pruning).
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return _SyntheticReaderBase(self.options)
        return SyntheticSumstatsReader(self.options)
