"""Pluggable LD block-matrix backends (SURVEY §2.H — r7).

Reference: method/ld_matrix_interface.py ``LDMatrixInterface`` — one
toolset that dispatches per-ancestry between two physical LD stores
(PanUKBB block matrices for nfe/csa/afr, gnomAD Hail block matrices
otherwise), each exposing the same two capabilities: a per-locus
variant index (``get_locus_index_boundaries``) and the LD block for
that index (``get_numpy_matrix``).

Spark-first re-expression: a backend returns DATAFRAMES — the locus
index as (idx, variant_id, pos) and the block as a sparse symmetric
(idx_i, idx_j, r) entry table — so slicing/joining stays distributed
and prunable; densification to the numpy hand-off shape the SuSiE /
CARMA kernels consume happens at the edge via the Arrow-batched
``locus_dense_matrices`` (operators/ld_matrix.py), or driver-side for
a single locus. Backends:

- ``EntryTableLDBackend`` — the gnomAD posture: a (possibly
  upper-triangular) parquet entry table + a variant index table; a
  locus slice is two pushed range predicates on the entry scan
  (operators/ld_matrix.py ``ld_block_slice``), never a full read.
- ``SyntheticGridLDBackend`` — the PanUKBB stand-in on the synthetic
  grid: exp-decay LD computed from positions with the span-tile
  equi-join, parameterized per ancestry label (distinct decay scales
  stand in for distinct population LD structure).
"""

from __future__ import annotations

import threading
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gentropy_spark.operators.ld_matrix import (
    ld_block_slice,
    resolve_variant_indices,
    transpose_ld_triangular,
)

# Reference ancestry dispatch map (method/ld_matrix_interface.py:22):
# these populations resolve to the PanUKBB-shaped backend under its
# own labels; anything else falls through to the gnomAD-shaped one.
ANCESTRY_MAP = {"nfe": "EUR", "csa": "CSA", "afr": "AFR"}


class LDMatrixBackend(Protocol):
    """The two capabilities every LD store must provide."""

    def locus_index(
        self, contig: str, start: int, end: int
    ) -> DataFrame:
        """Variant index rows (idx, variant_id, pos) for a locus window."""
        ...

    def block_entries(self, locus_index: DataFrame) -> DataFrame:
        """Symmetric sparse (idx_i, idx_j, r) entries for the index."""
        ...


class EntryTableLDBackend:
    """gnomAD-shaped backend over an entry table + variant index.

    ``entries`` holds (idx_i <= idx_j, r) upper-triangular rows;
    ``index`` holds (idx, variant_id, contig, pos). A locus block is a
    square index-range slice — both predicates push to the scan.
    """

    def __init__(self, entries: DataFrame, index: DataFrame) -> None:
        self._entries = entries
        self._index = index

    def locus_index(self, contig: str, start: int, end: int) -> DataFrame:
        return self._index.filter(
            (F.col("contig") == contig)
            & (F.col("pos") >= start)
            & (F.col("pos") <= end)
        ).select("idx", "variant_id", "pos")

    def block_entries(self, locus_index: DataFrame) -> DataFrame:
        bounds = locus_index.agg(
            F.min("idx").alias("lo"), F.max("idx").alias("hi")
        ).first()
        if bounds["lo"] is None:
            return self._entries.limit(0).select("idx_i", "idx_j", "r")
        sliced = ld_block_slice(
            self._entries, int(bounds["lo"]), int(bounds["hi"])
        )
        return transpose_ld_triangular(sliced).select("idx_i", "idx_j", "r")


class SyntheticGridLDBackend:
    """PanUKBB-shaped stand-in: positional exp-decay LD per ancestry.

    r(i, j) = exp(-|pos_i - pos_j| / tau(ancestry)); the per-ancestry
    decay scale stands in for population-specific LD structure. The
    pair table is built with the bounded-span tile join, so cost
    follows tile occupancy — the same scale shape as pairwise_ld.
    """

    TAUS = {"EUR": 10_800_000_000.0, "CSA": 7_200_000_000.0, "AFR": 3_600_000_000.0}
    SPAN_US = 21_600_000_000

    def __init__(self, variants: DataFrame, ancestry: str = "EUR") -> None:
        if ancestry not in self.TAUS:
            raise ValueError(f"unknown ancestry label {ancestry!r}")
        self._variants = variants  # (contig, pos, variant_id)
        self._tau = self.TAUS[ancestry]

    def locus_index(self, contig: str, start: int, end: int) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy(F.lit(1)).orderBy("pos", "variant_id")
        return (
            self._variants.filter(
                (F.col("contig") == contig)
                & (F.col("pos") >= start)
                & (F.col("pos") <= end)
            )
            .select("variant_id", "pos")
            .withColumn("idx", F.row_number().over(w).cast("long") - 1)
            .select("idx", "variant_id", "pos")
        )

    def block_entries(self, locus_index: DataFrame) -> DataFrame:
        from gentropy_spark.operators.overlaps import span_self_pairs

        base = locus_index.select(
            F.lit("_locus").alias("g"), "idx", "pos"
        )
        pairs = span_self_pairs(base, ["g"], "pos", self.SPAN_US).filter(
            F.col("idx") <= F.col("idx_b")
        )
        sym = transpose_ld_triangular(
            pairs.select(
                F.col("idx").alias("idx_i"),
                F.col("idx_b").alias("idx_j"),
                F.round(
                    F.exp(-F.abs(F.col("pos") - F.col("pos_b")) / self._tau), 6
                ).alias("r"),
            )
        )
        return sym.select("idx_i", "idx_j", "r")


def backend_for_ancestry(
    ancestry: str,
    panukbb_variants: DataFrame,
    gnomad_entries: DataFrame,
    gnomad_index: DataFrame,
    panukbb_stores: dict[str, tuple[DataFrame, DataFrame]] | None = None,
) -> LDMatrixBackend:
    """The reference's dispatch rule (ld_matrix_interface.py:46): nfe /
    csa / afr resolve to the PanUKBB-shaped backend under the mapped
    label; every other ancestry uses the gnomAD-shaped entry table.

    ``panukbb_stores`` maps the PanUKBB population label ('EUR' /
    'CSA' / 'AFR') to its OWN ingested (aligned index, half-matrix
    entries) pair — the reference loads a distinct block matrix per
    population ({POP}-templated paths), so one shared store would
    silently serve the wrong population's LD. The synthetic grid
    remains the stand-in for labels without an ingested store."""
    if ancestry in ANCESTRY_MAP:
        label = ANCESTRY_MAP[ancestry]
        store = (panukbb_stores or {}).get(label)
        if store is not None:
            return PanUKBBEntryBackend(*store)
        return SyntheticGridLDBackend(panukbb_variants, ancestry=label)
    return EntryTableLDBackend(gnomad_entries, gnomad_index)


def locus_numpy_matrix(
    backend: LDMatrixBackend, contig: str, start: int, end: int
):
    """Single-locus dense hand-off (``get_numpy_matrix`` analog).

    Collects ONE locus block driver-side and densifies — the same
    posture as the reference (the fine-mapper consumes a per-locus
    numpy matrix). For many loci at once, feed ``block_entries`` into
    ``locus_dense_matrices`` instead (Arrow-batched, distributed).
    Returns (variant_ids, matrix).
    """
    import numpy as np

    _warn_locus_collect_loop()
    idx = backend.locus_index(contig, start, end)
    rows = idx.orderBy("idx").collect()
    if not rows:
        return [], np.zeros((0, 0))
    ids = [r["variant_id"] for r in rows]
    lookup = {r["idx"]: k for k, r in enumerate(rows)}
    n = len(rows)
    M = np.eye(n)
    for e in backend.block_entries(idx).collect():
        a, b = lookup.get(e["idx_i"]), lookup.get(e["idx_j"])
        if a is None or b is None:
            continue
        M[a, b] = e["r"]
        M[b, a] = e["r"]
    return ids, M


class PanUKBBEntryBackend:
    """PanUKBB-shaped backend over an ALIGNED variant index + half matrix.

    Reference: datasource/pan_ukbb_ld/ld.py — ``index`` is the output
    shape of the allele-alignment step (plans/graph_ld.py
    ``panukbb_ld_align``): (idx, variant_id, contig, pos,
    allele_order); ``half_entries`` is the Hail block-matrix upper
    half as a sparse (idx_i <= idx_j, r) entry table.
    ``block_entries`` reproduces ``get_numpy_matrix`` (:154):
    symmetrize the half matrix (``half + half.T - diag(diag)``,
    :196), apply the outer allele-order sign to off-diagonal entries
    (:188 — the diagonal of the outer product is forced to +1), and
    force the diagonal to exactly 1 (:199) — all as relational ops on
    the entry table, so a locus slice stays two pushed range
    predicates and the densification happens only at the numpy edge.
    """

    def __init__(self, index: DataFrame, half_entries: DataFrame) -> None:
        self._index = index
        self._entries = half_entries

    def locus_index(self, contig: str, start: int, end: int) -> DataFrame:
        return self._index.filter(
            (F.col("contig") == contig)
            & (F.col("pos") >= start)
            & (F.col("pos") <= end)
        ).select("idx", "variant_id", "pos", "allele_order")

    def block_entries(self, locus_index: DataFrame) -> DataFrame:
        bounds = locus_index.agg(
            F.min("idx").alias("lo"), F.max("idx").alias("hi")
        ).first()
        if bounds["lo"] is None:
            return self._entries.limit(0).select("idx_i", "idx_j", "r")
        sliced = ld_block_slice(
            self._entries, int(bounds["lo"]), int(bounds["hi"])
        )
        sym = transpose_ld_triangular(sliced)
        ao = F.broadcast(
            locus_index.select("idx", F.col("allele_order").alias("ao"))
        )
        return (
            sym.join(ao.withColumnRenamed("idx", "idx_i"), on="idx_i")
            .withColumnRenamed("ao", "ao_i")
            .join(
                ao.withColumnRenamed("idx", "idx_j").withColumnRenamed(
                    "ao", "ao_j"
                ),
                on="idx_j",
            )
            .select(
                "idx_i",
                "idx_j",
                F.when(F.col("idx_i") == F.col("idx_j"), F.lit(1.0))
                .otherwise(F.col("r") * F.col("ao_i") * F.col("ao_j"))
                .alias("r"),
            )
        )


# Soft guard for the single-locus collect path: the reference's
# per-locus numpy hand-off is fine for a handful of loci, but looping
# it over thousands re-runs a driver collect per locus — the Arrow
# path (operators/ld_matrix.py locus_dense_matrices) does the same
# densification distributed. Warn once past the threshold.
_LOCUS_COLLECT_WARN_AFTER = 100
_locus_collect_calls = 0
_locus_collect_warned = False
_locus_collect_lock = threading.Lock()


def _warn_locus_collect_loop() -> None:
    # r9 advisory fix: the bare `== threshold` check could be jumped
    # over (or double-fired) by concurrent driver threads; a lock plus
    # a warned flag makes the one-shot warning race-free.
    global _locus_collect_calls, _locus_collect_warned
    with _locus_collect_lock:
        _locus_collect_calls += 1
        if (
            _locus_collect_warned
            or _locus_collect_calls < _LOCUS_COLLECT_WARN_AFTER
        ):
            return
        _locus_collect_warned = True
    import warnings

    warnings.warn(
        "locus_numpy_matrix has been called "
        f"{_LOCUS_COLLECT_WARN_AFTER}+ times in this process; each call "
        "is a driver-side collect. For many loci, batch through "
        "operators/ld_matrix.py locus_dense_matrices (Arrow-based, "
        "distributed) instead.",
        RuntimeWarning,
        stacklevel=3,
    )
