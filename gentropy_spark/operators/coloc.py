"""Colocalisation operators: COLOC and eCAVIAR CLPP (SURVEY §2.C6–C7).

Re-expresses gentropy's Bayesian colocalisation
(/root/reference/src/gentropy/method/colocalisation.py: ``Coloc`` at
:192, ``ECaviar`` at :100) as pure Column-expression aggregations —
no UDFs, no vector types:

- The reference materialises per-group log-BF dense vectors and runs a
  numpy ``logsumexp`` UDF per row. Here logsumexp is a two-pass
  grouped aggregation: ``max(x)`` then ``ln(sum(exp(x - max))) + max``
  — whole-stage-codegen friendly and partial-agg friendly (max and sum
  both combine map-side).
- H3's "same-signal" exclusion term uses the identity
  log(Σ_{i≠j} e^{a_i + b_j}) = logdiff(logsum(a) + logsum(b),
  logsum(a+b)) exactly as the reference does.

Input contract: one row per overlapping tag variant with columns
(group keys..., left_logbf, right_logbf, left_pp, right_pp).
"""

from __future__ import annotations

import functools
import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _logsumexp_agg(col: F.Column, mx: F.Column) -> F.Column:
    """Grouped logsumexp given the pre-computed group max."""
    return F.log(F.sum(F.exp(col - mx))) + mx


def grouped_logsumexp(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    """logsumexp(value) per group (SURVEY §2.G2).

    Reference: common/stats.py:23 ``get_logsum`` (numpy UDF) — here a
    max-shifted window + aggregate over ONE exchange (r14, same regime
    flip as ``coloc``'s inline note: the r3 aggregate-join only wins
    while the max table broadcasts; once the group count grows past
    the broadcast threshold the join sorts the full input anyway and
    pays a second 60M-row build — measured 3.8x slower at 10x).
    """
    w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_mx", F.max(value_col).over(w))
        .groupBy(*group_cols, "_mx")
        .agg(
            (
                F.log(F.sum(F.exp(F.col(value_col) - F.col("_mx")))) + F.col("_mx")
            ).alias("logsum")
        )
        .drop("_mx")
    )


def coloc(
    overlaps: DataFrame,
    group_cols: Sequence[str],
    left_logbf: str = "left_logbf",
    right_logbf: str = "right_logbf",
    prior_c1: float = 1e-4,
    prior_c2: float = 1e-4,
    prior_c12: float = 1e-5,
    extra_aggs: Sequence | None = None,
    max_strategy: str = "window",
) -> DataFrame:
    """COLOC H0..H4 posterior probabilities per overlap group.

    Returns one row per group with (n_overlapping, h0..h4), plus one
    column per aliased aggregate in ``extra_aggs`` — composed consumers
    (the L2G coloc feature family needs CLPP alongside H4) fold their
    metric into THIS aggregation instead of scanning the overlap
    pipeline a second time.

    Scale shape (r14 — window-max over ONE exchange, replacing the r3
    aggregate-join): the three group maxima ride one unordered window
    over one hash exchange of the overlap rows, and the logsumexp
    groupBy reuses the same partitioning exchange-free. The r3
    agg-join held only while the max table stayed broadcastable; the
    10x probe measured its SortMergeJoin regime at 3.8x the window
    form's wall (see the inline note below).
    """
    if not group_cols:
        # The group-key null-filter, the max window and the final
        # aggregate all key on group_cols; an empty list would surface
        # as an opaque analysis error (r13, was reduce() raising on an
        # empty iterable).
        raise ValueError(
            "coloc() requires at least one group column; for a global "
            "colocalisation add a constant key column"
        )
    lp1, lp2, lp12 = math.log(prior_c1), math.log(prior_c2), math.log(prior_c12)

    # Evaluated and REJECTED (r6): constant-shift logsumexp
    # (domain-bounded logbf would allow skipping the max pass for a
    # single-pass aggregate) — hash-exact but slower on the fused L2G
    # path, and re-measured slower again on the r13 10x probe.
    # Explicit null-drop on the group keys (r12): output-identical —
    # the window and aggregate are null-grouping where the old max
    # join was null-unsafe, so the filter preserves the published
    # null-key semantics (such rows never reached the result).
    # F.lit(True) initializer: empty group_cols degrades to a no-op
    # filter instead of reduce() raising on an empty iterable (r13).
    nn = functools.reduce(
        lambda a, b: a & b,
        (F.col(c).isNotNull() for c in group_cols),
        F.lit(True),
    )
    base = overlaps.filter(nn).withColumn(
        "_sum_bf", F.col(left_logbf) + F.col(right_logbf)
    )
    # WINDOW-max shift (r14, replacing the r3 aggregate-join): all
    # three group maxima ride ONE unordered window over ONE exchange
    # of the overlap rows, and the logsumexp groupBy reuses that same
    # partitioning exchange-free. The r3 aggregate-join was the right
    # call while the max table stayed broadcastable, but its own 10x
    # probe showed the regime flip: at ~60M groups AQE degrades the
    # max join to a SortMergeJoin that sorts the full overlap input
    # anyway — exactly the cost the window pays — PLUS builds and
    # sorts a 60M-row max table. Measured head-to-head on the staged
    # 10x harness (docs/SCALE_PROBE.md r14): 161.6s (agg-join) ->
    # 42.2s (window), DuckDB 52.6s — coloc crosses BELOW the oracle
    # at scale — and the window form is also faster at sf0.1
    # (1.16 -> 0.86s standalone). Posteriors bit-identical on all
    # 5,950 sf0.01 groups.
    # Both regimes measured (adjacent A/B, min-of-3, sf0.1 + staged
    # 10x): "window" wins standalone and at scale (coloc 1.6 -> 1.2s
    # at sf0.1; 161.6 -> 42.2s at 10x where agg_join's max join is an
    # SMJ); "agg_join" wins inside the FUSED L2G feature family
    # (l2g_coloc_features 3.1 vs 5.1s) where the qtl-family coloc
    # subtrees share canonically-equal exchanges that AQE materializes
    # once — the window's sort node sits above the shared exchange and
    # breaks that reuse. Values are bit-identical either way; callers
    # pick the regime that matches their composition.
    if max_strategy == "window":
        w = Window.partitionBy(*group_cols)
        enriched = base.select(
            "*",
            F.max(left_logbf).over(w).alias("_mx_l"),
            F.max(right_logbf).over(w).alias("_mx_r"),
            F.max("_sum_bf").over(w).alias("_mx_s"),
        )
    elif max_strategy == "agg_join":
        mx = base.groupBy(*group_cols).agg(
            F.max(left_logbf).alias("_mx_l"),
            F.max(right_logbf).alias("_mx_r"),
            F.max("_sum_bf").alias("_mx_s"),
        )
        enriched = base.join(mx, on=list(group_cols))
    else:
        raise ValueError(
            f"max_strategy must be 'window' or 'agg_join', got "
            f"{max_strategy!r}"
        )
    grouped = enriched.groupBy(*group_cols, "_mx_l", "_mx_r", "_mx_s").agg(
        F.count("*").alias("n_overlapping"),
        _logsumexp_agg(F.col(left_logbf), F.col("_mx_l")).alias("logsum1"),
        _logsumexp_agg(F.col(right_logbf), F.col("_mx_r")).alias("logsum2"),
        _logsumexp_agg(F.col("_sum_bf"), F.col("_mx_s")).alias("logsum12"),
        *(extra_aggs or ()),
    )
    extra_names = [
        grouped.columns[i]
        for i in range(len(grouped.columns) - len(extra_aggs or ()), len(grouped.columns))
    ]

    # STAGED posterior projection (r13, verdict #3's last coloc item):
    # the old single-select composition inlined the lh3 CASE tree and
    # the 5-term denominator into every h0..h4 output (~25 copies of
    # the logsumexp subtree in one Project — plan bloat that every
    # composed consumer re-analyzes and re-codegens). Naming each lh
    # hypothesis, the max, and the denominator ONCE in their own
    # projections keeps them single-copy: CollapseProject deliberately
    # does not inline multi-use non-cheap aliases. Arithmetic is
    # IDENTICAL (same subtrees, just named) — posteriors bit-equal on
    # every sf0.01 group for both q_coloc and the fused L2G family;
    # measured ~0.2s faster on both at sf0.1.
    sumlogsum = F.col("logsum1") + F.col("logsum2")
    mx34 = F.greatest(sumlogsum, F.col("logsum12"))
    # logdiff(sumlogsum, logsum12): log(e^a - e^b) with a = logsum1+logsum2.
    logdiff = F.when(
        sumlogsum <= F.col("logsum12"),
        F.lit(-math.inf),
    ).otherwise(
        mx34 + F.log(F.exp(sumlogsum - mx34) - F.exp(F.col("logsum12") - mx34))
    )
    hyps = grouped.select(
        *group_cols,
        "n_overlapping",
        *extra_names,
        F.lit(0.0).alias("_lh0"),
        (F.lit(lp1) + F.col("logsum1")).alias("_lh1"),
        (F.lit(lp2) + F.col("logsum2")).alias("_lh2"),
        (F.lit(lp1) + F.lit(lp2) + logdiff).alias("_lh3"),
        (F.lit(lp12) + F.col("logsum12")).alias("_lh4"),
    )
    shifted = hyps.select(
        "*", F.greatest(*[F.col(f"_lh{i}") for i in range(5)]).alias("_amx")
    )
    denom = sum(
        (F.exp(F.col(f"_lh{i}") - F.col("_amx")) for i in range(1, 5)),
        F.exp(F.col("_lh0") - F.col("_amx")),
    )
    normed = shifted.select("*", denom.alias("_den"))
    return normed.select(
        *group_cols,
        "n_overlapping",
        *[
            (F.exp(F.col(f"_lh{i}") - F.col("_amx")) / F.col("_den")).alias(
                f"h{i}"
            )
            for i in range(5)
        ],
        *extra_names,
    )


def ecaviar_clpp(
    overlaps: DataFrame,
    group_cols: Sequence[str],
    left_pp: str = "left_pp",
    right_pp: str = "right_pp",
    extra_aggs: Sequence | None = None,
) -> DataFrame:
    """eCAVIAR colocalisation posterior probability per overlap group.

    CLPP = Σ_tags left_pp · right_pp (reference colocalisation.py:108
    ``_get_clpp`` + the groupBy at :163).
    """
    return overlaps.groupBy(*group_cols).agg(
        F.count("*").alias("n_overlapping"),
        F.sum(F.col(left_pp) * F.col(right_pp)).alias("clpp"),
        *(extra_aggs or ()),
    )


def beta_ratio_sign_avg(
    left_beta: str = "left_beta", right_beta: str = "right_beta"
) -> F.Column:
    """Average sign of the left/right beta ratio across a locus pair.

    Reference: dataset/study_locus_overlap.py:55-84
    ``calculate_beta_ratio`` — rows where either beta is NULL or zero
    are dropped, then ``avg(signum(left_beta / right_beta))`` per
    overlapping pair; method/colocalisation.py joins the result into
    BOTH methods' outputs (:183 eCAVIAR, :445 COLOC, :638 COLOC_PIP)
    as the public schema's ``betaRatioSignAverage`` column
    (assets/schemas/colocalisation.json:77).

    Here the same statistic folds into the EXISTING per-pair
    aggregation as one conditional average instead of the reference's
    second groupBy + left join: avg() ignores NULLs, so an
    invalid-beta tag contributes nothing and an all-invalid pair
    yields NULL — exactly the left-join-miss semantics — with zero
    extra shuffles. signum(l/r) is computed as the sign of the
    product (the guard has already excluded zeros), which avoids the
    division and cross-engine signum() return-type differences.
    """
    valid = (
        F.col(left_beta).isNotNull()
        & F.col(right_beta).isNotNull()
        & (F.col(left_beta) != 0)
        & (F.col(right_beta) != 0)
    )
    sign = F.when(
        F.col(left_beta) * F.col(right_beta) > 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    return F.avg(F.when(valid, sign)).alias("beta_ratio_sign_avg")


def append_study_metadata(
    coloc_df: DataFrame,
    study_locus: DataFrame,
    study_index: DataFrame,
    *,
    metadata_cols: Sequence[str],
    colocalisation_side: str = "right",
    locus_id_col: str = "study_locus_id",
    study_id_col: str = "study_id",
) -> DataFrame:
    """Append study metadata to one side of a colocalisation table.

    Reference: dataset/colocalisation.py:130-183
    ``Colocalisation.append_study_metadata`` — the (locus -> study ->
    metadata) bridge joined back onto ``{side}_study_locus_id``. The
    bridge is built DISTINCT and broadcast (locus/study dimensions are
    small relative to the coloc pair table), so the pair table is
    never shuffled; column names come out as ``{side}_{col}`` in this
    repo's snake_case convention (the reference camelCases).
    """
    if colocalisation_side not in ("right", "left"):
        raise ValueError(
            "colocalisation_side must be either 'right' or 'left', got "
            f"{colocalisation_side!r}"
        )
    side = colocalisation_side
    cols = [study_id_col, *metadata_cols]
    bridge = (
        study_locus.select(locus_id_col, study_id_col)
        .join(F.broadcast(study_index.select(study_id_col, *metadata_cols)), study_id_col)
        .distinct()
        .select(
            F.col(locus_id_col).alias(f"{side}_{locus_id_col}"),
            *[F.col(c).alias(f"{side}_{c}") for c in cols],
        )
    )
    # Mirror the reference's studyType-collision rule: a requested
    # metadata column replaces a same-named column already present on
    # that side of the pair table.
    drop = [
        f"{side}_{c}" for c in cols if f"{side}_{c}" in coloc_df.columns
    ]
    return F.broadcast(bridge).join(
        coloc_df.drop(*drop), on=f"{side}_{locus_id_col}", how="right"
    )


def annotate_study_type(
    locus_df: DataFrame,
    study_index: DataFrame,
    *,
    study_id_col: str = "study_id",
    study_type_col: str = "study_type",
) -> DataFrame:
    """Annotate a study-locus table with its study's type.

    Reference: dataset/study_locus.py:233 ``annotate_study_type`` —
    drop any stale ``studyType`` column, then LEFT join the study
    index's ``study_type_lut()`` (study_index.py:226, a 2-column
    (studyId, studyType) projection) on ``studyId``. Loci whose study
    is absent from the index keep a NULL type (a left join, never a
    filter — the MISSING_STUDY case is a separate QC verb).

    Spark-first shape: the LUT is a dimension (one row per study), so
    in practice it broadcasts and the locus fact table is never
    shuffled — but the hint is NOT forced (r16 advisory): callers may
    pass an UNBOUNDED study index (the L2G path derives its QTL LUT
    from the full customer table, O(SF) rows), and a forced
    ``F.broadcast`` of an unbounded side is exactly the scale ceiling
    r16 removed from bpe_encode's vocab join. Size stats / AQE pick
    the strategy: a real study index measures dimension-sized and
    broadcasts; a grown one shuffle-joins instead of OOMing the
    executors. This is the StudyLocus-side sibling of
    ``append_study_metadata`` above (which serves the colocalisation
    table's left/right sides, where the bridge is locus-bounded).
    """
    lut = study_index.select(study_id_col, study_type_col)
    return locus_df.drop(study_type_col).join(
        lut, on=study_id_col, how="left"
    )


def drop_trans_effects(
    coloc_df: DataFrame,
    study_locus: DataFrame,
    *,
    locus_id_col: str = "study_locus_id",
    is_trans_col: str = "is_trans_qtl",
) -> DataFrame:
    """Keep only cis-QTL colocalisation rows (right side not trans).

    Reference: dataset/colocalisation.py:185-210
    ``Colocalisation.drop_trans_effects`` — NULL ``isTransQtl`` counts
    as cis (the reference's ``~col | col.isNull()`` predicate), and
    the filter is a broadcast semi-join on the right locus id so the
    pair table is never shuffled.
    """
    cis = study_locus.filter(
        (~F.col(is_trans_col)) | F.col(is_trans_col).isNull()
    ).select(F.col(locus_id_col).alias(f"right_{locus_id_col}"))
    return coloc_df.join(
        F.broadcast(cis), on=f"right_{locus_id_col}", how="left_semi"
    )
