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
   prefix-sum them per part on the aggregate (driver-scale window),
   and broadcast-join the offsets back;
4. final value = bucket prefix offset + within-bucket cumsum.

Equivalent to the reference's single-partition packing semantics
(conceptually ``dataset/`` batch assembly) but shaped for a
1000-executor cluster: no task ever sorts more than ``bucket_span``
order-key ticks of one source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Order-key ticks per bucket. At 100 TB with ~1e11 docs this yields
# ~1e7 buckets — the totals aggregate is ~1e7 rows (a broadcast-able
# dim), while each within-bucket sort is <= 8192 rows.
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
    totals = (
        df.withColumn("__pack_bucket", bucket)
        .groupBy(part_col, "__pack_bucket")
        .agg(F.sum(value_col).alias("__btot"))
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
        cum_in.join(F.broadcast(offsets), on=[part_col, "__pack_bucket"])
        .withColumn(out_col, (F.col("__offset") + F.col("__cum_in")).cast("long"))
        .drop("__pack_bucket", "__cum_in", "__offset")
    )
