"""Scale-safe running token cumsum for sequence packing.

The contiguous-fill packer (plans/llm_pipeline.py E17/E22) needs a
running ``SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)``.
``source`` is a data-derived, LOW-cardinality key: a single-level
window would funnel one source's entire document stream through one
task's sort at 100 TB. This module provides the two-level equivalent
with identical output values:

1. bucket every row by a monotone function of the order key
   (``order_col div bucket_span``) — order within a source is
   preserved across bucket boundaries by construction;
2. run the unbounded cumsum WITHIN (part, bucket) — bounded per-task
   sort, parallelism = #buckets, one exchange on (part, bucket);
3. aggregate per-bucket totals (tiny: one row per (part, bucket)),
   prefix-sum them per part on the aggregate (driver-scale window)
   and join the offsets back on (part, bucket);
4. final value = bucket prefix offset + within-bucket cumsum.

Deliberate trade-off: the totals aggregate is written over the
windowed intermediate, but Catalyst's column pruning specializes
that branch into a NARROW second pass over the upstream plan (only
(part, order, value) survive, the window/sort are elided, and the
partial aggregation combines map-side so the branch shuffles only
one row per bucket). The alternative — persisting the windowed
stream to share one scan — would materialize the full 100 TB input;
a pruned, map-combined recompute is the cheaper side of that trade,
and callers with an expensive upstream can cache it themselves.

The offsets join carries NO forced broadcast hint: the offsets
relation has one row per (part, bucket) — ~1e7 rows at 100 TB, past
any sane broadcast threshold — while at bench scale AQE sees the
tiny runtime size and picks a broadcast join on its own. The big
side is already hash-partitioned on the join key from step 2, so
even the sort-merge fallback adds no new exchange of the data.

Equivalent to the reference's single-partition packing semantics
(conceptually ``dataset/`` batch assembly) but shaped for a
1000-executor cluster: no task ever sorts more than ``bucket_span``
order-key ticks of one source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Order-key ticks per bucket. At 100 TB with ~1e11 docs this yields
# ~1e7 buckets — each within-bucket sort is <= 8192 rows, and the
# totals aggregate is ~1e7 rows (fine for a shuffled join; never
# force-broadcast).
DEFAULT_BUCKET_SPAN = 8192


def bucketed_cumsum(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "cum_tokens",
    bucket_span: int = DEFAULT_BUCKET_SPAN,
) -> DataFrame:
    """Running sum of ``value_col`` per ``part_col`` ordered by
    ``order_col``, computed without ever sorting a whole partition in
    one task. Output values are bit-identical to the single-level
    ``Window.partitionBy(part).orderBy(order)`` cumsum.

    PRECONDITION: ``part_col`` and ``order_col`` must be non-null.
    The offsets join keys on them with plain equality, so a NULL in
    either silently drops the row (where the single-level window
    would keep NULL as a valid partition/order value). Callers own
    the guarantee — the packer's (source, doc_id) keys are non-null
    by construction.

    ``order_col`` must be integral (the bucket is ``order div span``).
    The helper column ``__pack_bucket`` is dropped before returning.
    """
    bucket = F.expr(f"{order_col} div {int(bucket_span)}")
    within = (
        Window.partitionBy(part_col, "__pack_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = df.withColumn("__pack_bucket", bucket).withColumn(
        "__cum_in", F.sum(value_col).over(within)
    )
    # Bucket totals: logically over cum_in; physically Catalyst prunes
    # this branch to a narrow (part, order, value) pass with map-side
    # partial aggregation — see the module docstring's trade-off note.
    totals = cum_in.groupBy(part_col, "__pack_bucket").agg(
        F.sum(value_col).alias("__btot")
    )
    prior = (
        Window.partitionBy(part_col)
        .orderBy("__pack_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        part_col,
        "__pack_bucket",
        F.coalesce(F.sum("__btot").over(prior), F.lit(0)).alias("__offset"),
    )
    return (
        cum_in.join(offsets, on=[part_col, "__pack_bucket"])
        .withColumn(out_col, (F.col("__offset") + F.col("__cum_in")).cast("long"))
        .drop("__pack_bucket", "__cum_in", "__offset")
    )
