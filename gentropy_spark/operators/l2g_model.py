"""Frozen L2G gradient-boosted scorer (SURVEY §2.H3 upgrade, r3).

Re-expresses the role of the reference's GBM L2G model
(/root/reference/src/gentropy/method/l2g/model.py + trainer.py:1-625:
gradient-boosted classifier over the L2G feature matrix, persisted and
applied via a pandas predict) as a DEPENDENCY-FREE frozen artifact:

- ``TREES`` is a 12-tree, depth-2 boosted ensemble (logistic loss,
  learning-rate-scaled leaves) trained once by
  ``scripts/train_l2g_gbm.py`` on the sf0.01 feature matrix joined to
  the gold-standard labels, then frozen here for reproducibility.
- Serving is Arrow-batched: ``margin_udf`` evaluates the ensemble with
  numpy boolean masks over whole batches (the scale path — a
  CASE-WHEN expression chain would re-enter the codegen-size trap for
  big ensembles), summing tree outputs in fixed order so the margin is
  bit-reproducible; the sigmoid stays JVM-side where the engine's
  exp/round parity rules already hold.
- ``margin_sql`` emits the identical ensemble as DuckDB CASE WHEN text
  (same comparison semantics, same left-to-right addition), so the
  scorer is fully value-hash oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

FEATURES = ['max_weight', 'rel_weight', 'n_hits', 'genes_in_flank', 'eqtl_h4_max', 'eqtl_h4_nbh', 'eqtl_clpp_max', 'eqtl_clpp_nbh', 'pqtl_h4_max', 'pqtl_h4_nbh', 'pqtl_clpp_max', 'pqtl_clpp_nbh', 'sqtl_h4_max', 'sqtl_h4_nbh', 'sqtl_clpp_max', 'sqtl_clpp_nbh', 'vep_max', 'vep_mean', 'vep_max_nbh', 'vep_mean_nbh', 'gene_count_w', 'protein_gene_count_w', 'is_protein_coding', 'credset_confidence', 'e2g_mean', 'e2g_mean_nbh', 'distance_sentinel_tss', 'distance_sentinel_tss_nbh', 'distance_sentinel_footprint', 'distance_sentinel_footprint_nbh', 'distance_tss_mean', 'distance_tss_mean_nbh', 'distance_footprint_mean', 'distance_footprint_mean_nbh']
TREES = [{'feat': 'max_weight',
  'left': {'feat': 'max_weight',
           'left': {'leaf': -0.12},
           'right': {'leaf': -0.598040816},
           'thr': 0.0004905},
  'right': {'feat': 'max_weight',
            'left': {'leaf': 0.12},
            'right': {'leaf': 0.599345692},
            'thr': 0.501422},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'max_weight',
           'left': {'leaf': -0.463398671},
           'right': {'leaf': -0.086611072},
           'thr': 0.498578},
  'right': {'feat': 'eqtl_h4_max',
            'left': {'leaf': 0.464227681},
            'right': {'leaf': 0.086544281},
            'thr': 0.99978},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'eqtl_h4_max',
           'left': {'leaf': -0.402171044},
           'right': {'leaf': -0.064745951},
           'thr': 0.970348},
  'right': {'feat': 'pqtl_h4_max',
            'left': {'leaf': 0.403025554},
            'right': {'leaf': 0.064654109},
            'thr': 0.9999175},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'pqtl_h4_max',
           'left': {'leaf': -0.367553315},
           'right': {'leaf': -0.048910768},
           'thr': 0.994302},
  'right': {'feat': 'sqtl_h4_max',
            'left': {'leaf': 0.368587364},
            'right': {'leaf': 0.048804231},
            'thr': 0.9979715},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_h4_max',
           'left': {'leaf': -0.345785558},
           'right': {'leaf': -0.037023112},
           'thr': 0.7953455},
  'right': {'feat': 'distance_sentinel_tss',
            'left': {'leaf': 0.347108673},
            'right': {'leaf': 0.036906362},
            'thr': 0.999957},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_clpp_max',
           'left': {'leaf': -0.331136787},
           'right': {'leaf': -0.027991547},
           'thr': 0.0188325},
  'right': {'feat': 'distance_sentinel_tss',
            'left': {'leaf': 0.332860669},
            'right': {'leaf': 0.035848339},
            'thr': 0.999957},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'vep_max',
           'left': {'leaf': -0.320729877},
           'right': {'leaf': -0.021117674},
           'thr': 0.455},
  'right': {'feat': 'sqtl_h4_max',
            'left': {'leaf': 0.32300457},
            'right': {'leaf': 0.027565473},
            'thr': 0.9979715},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'distance_sentinel_footprint',
           'left': {'leaf': -0.312926792},
           'right': {'leaf': -0.015898568},
           'thr': 0.969289},
  'right': {'feat': 'pqtl_h4_max',
            'left': {'leaf': 0.315931468},
            'right': {'leaf': 0.021270489},
            'thr': 0.9999175},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'distance_sentinel_footprint',
           'left': {'leaf': -0.306691645},
           'right': {'leaf': -0.015672593},
           'thr': 0.969289},
  'right': {'feat': 'eqtl_h4_max',
            'left': {'leaf': 0.310663671},
            'right': {'leaf': 0.016664244},
            'thr': 0.99978},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'vep_max',
           'left': {'leaf': -0.301334658},
           'right': {'leaf': -0.011872978},
           'thr': 0.455},
  'right': {'feat': 'max_weight',
            'left': {'leaf': 0.013795311},
            'right': {'leaf': 0.306558065},
            'thr': 0.501422},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_clpp_max',
           'left': {'leaf': -0.296314622},
           'right': {'leaf': -0.008991902},
           'thr': 0.0188325},
  'right': {'feat': 'distance_sentinel_tss',
            'left': {'leaf': 0.303162499},
            'right': {'leaf': 0.011706465},
            'thr': 0.999957},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_h4_max',
           'left': {'leaf': -0.291206251},
           'right': {'leaf': -0.006824058},
           'thr': 0.7953455},
  'right': {'feat': 'sqtl_h4_max',
            'left': {'leaf': 0.30013544},
            'right': {'leaf': 0.008885533},
            'thr': 0.9979715},
  'thr': 0.5}]


def _eval_tree(tree: dict, cols: dict[str, np.ndarray], n: int) -> np.ndarray:
    if "leaf" in tree:
        return np.full(n, tree["leaf"])
    mask = cols[tree["feat"]] <= tree["thr"]
    out = np.empty(n)
    out[mask] = _eval_tree(tree["left"], {k: v[mask] for k, v in cols.items()}, int(mask.sum()))
    out[~mask] = _eval_tree(
        tree["right"], {k: v[~mask] for k, v in cols.items()}, int((~mask).sum())
    )
    return out


def margin_udf() -> "callable":
    """Arrow-batched ensemble margin: sum of tree outputs in tree order
    (fixed-order float64 adds — bit-reproducible and equal to the SQL
    form's left-associated addition chain)."""

    @pandas_udf("double")
    def _margin(*feature_cols: pd.Series) -> pd.Series:
        n = len(feature_cols[0])
        if n == 0:
            return pd.Series([], dtype="float64")
        cols = {
            name: s.to_numpy(dtype=np.float64)
            for name, s in zip(FEATURES, feature_cols)
        }
        total = np.zeros(n)
        for tree in TREES:
            total += _eval_tree(tree, cols, n)
        return pd.Series(total)

    return _margin


def _tree_sql(tree: dict) -> str:
    # Scientific notation: DuckDB parses plain decimal literals as
    # DECIMAL, which would make the oracle margin exact-decimal while
    # the Spark UDF sums float64 — '.17e' keeps both engines in DOUBLE.
    if "leaf" in tree:
        return format(tree["leaf"], ".17e")
    return (
        f"CASE WHEN {tree['feat']} <= {format(tree['thr'], '.17e')} "
        f"THEN {_tree_sql(tree['left'])} ELSE {_tree_sql(tree['right'])} END"
    )


def margin_sql() -> str:
    """The identical ensemble as one left-associated DuckDB expression."""
    return " + ".join(f"({_tree_sql(t)})" for t in TREES)
